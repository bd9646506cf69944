"""Unit tests for core ops: patch entropy and the EMA vector quantizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.ops.entropy import patch_entropy
from dynamicvectorquantization_tpu.ops.vq import VectorQuantizeEMA
from dynamicvectorquantization_tpu.ops.vq_pallas import (
    nearest_codes,
    nearest_codes_with_stats,
    nearest_codes_xla,
)


def _torch_reference_entropy(images_nhwc, patch_size=16, bins_lo=-1.0, bins_hi=1.0):
    """Independent numpy re-derivation of the reference entropy semantics
    (dqvae_dual_entropy.py:25-63) for cross-checking."""
    b, h, w, _ = images_nhwc.shape
    gray = (
        0.2989 * images_nhwc[..., 0]
        + 0.5870 * images_nhwc[..., 1]
        + 0.1140 * images_nhwc[..., 2]
    )
    gh, gw = h // patch_size, w // patch_size
    patches = gray.reshape(b, gh, patch_size, gw, patch_size).transpose(0, 1, 3, 2, 4)
    patches = patches.reshape(b, gh, gw, patch_size * patch_size)
    bins = np.linspace(bins_lo, bins_hi, 32)
    r = (patches[..., None] - bins) / 0.01
    kernel = np.exp(-0.5 * r * r)
    pdf = kernel.mean(axis=-2)
    pdf = pdf / (pdf.sum(-1, keepdims=True) + 1e-40) + 1e-40
    return -(pdf * np.log(pdf)).sum(-1)


def test_patch_entropy_matches_reference_semantics(np_rng):
    imgs = np_rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(patch_entropy(jnp.asarray(imgs), patch_size=16))
    want = _torch_reference_entropy(imgs)
    assert got.shape == (2, 4, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # flat patches have near-zero entropy; noisy patches have high entropy
    flat = np.zeros((1, 32, 32, 3), np.float32)
    e_flat = np.asarray(patch_entropy(jnp.asarray(flat), patch_size=16))
    noisy = np_rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    e_noisy = np.asarray(patch_entropy(jnp.asarray(noisy), patch_size=16))
    assert e_noisy.mean() > e_flat.mean() + 1.0


def test_patch_entropy_pallas_matches_xla(np_rng):
    """The fused TPU entropy kernel (interpret mode) vs the XLA fallback,
    at the flagship geometry's tiling (W % 128 == 0)."""
    from jax.experimental.pallas import tpu as pltpu

    imgs = np_rng.uniform(-1, 1, size=(2, 128, 128, 3)).astype(np.float32)
    want = np.asarray(patch_entropy(jnp.asarray(imgs), use_pallas=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(patch_entropy(jnp.asarray(imgs), use_pallas=True))
    assert got.shape == want.shape == (2, 8, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # non-default patch size / bin range (the offline threshold-table
    # convention) rides the same kernel
    want2 = np.asarray(patch_entropy(
        jnp.asarray(imgs), patch_size=8, bin_range=(0.0, 1.0), use_pallas=False))
    with pltpu.force_tpu_interpret_mode():
        got2 = np.asarray(patch_entropy(
            jnp.asarray(imgs), patch_size=8, bin_range=(0.0, 1.0), use_pallas=True))
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)


def test_nearest_codes_xla_correct(np_rng):
    x = jnp.asarray(np_rng.normal(size=(37, 16)).astype(np.float32))
    cb = jnp.asarray(np_rng.normal(size=(50, 16)).astype(np.float32))
    idx, xq = nearest_codes_xla(x, cb)
    d = np.linalg.norm(np.asarray(x)[:, None] - np.asarray(cb)[None], axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))
    np.testing.assert_allclose(np.asarray(xq), np.asarray(cb)[d.argmin(1)], rtol=1e-6)


def test_nearest_codes_with_stats_xla(np_rng):
    x = jnp.asarray(np_rng.normal(size=(40, 8)).astype(np.float32))
    cb = jnp.asarray(np_rng.normal(size=(12, 8)).astype(np.float32))
    idx, xq, esum, csize = nearest_codes_with_stats(x, cb, use_pallas=False)
    idx_np = np.asarray(idx)
    want_csize = np.bincount(idx_np, minlength=12).astype(np.float32)
    np.testing.assert_allclose(np.asarray(csize), want_csize)
    want_esum = np.zeros((12, 8), np.float32)
    np.testing.assert_allclose(
        np.asarray(esum),
        np.add.at(want_esum, idx_np, np.asarray(x)) or want_esum,
        rtol=1e-5,
        atol=1e-5,
    )


class TestVectorQuantizeEMA:
    def _make(self, **kw):
        return VectorQuantizeEMA(
            codebook_size=32, codebook_dim=8, use_pallas=False, **kw
        )

    def test_forward_shapes_and_straight_through(self, rng):
        vq = self._make()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
        variables = vq.init({"params": rng}, x)
        xq, loss, (_, _, code) = vq.apply(variables, x)
        assert xq.shape == x.shape
        assert code.shape == (2, 4, 4)
        assert loss.shape == ()

        # straight-through: d(xq)/d(x) == identity
        def f(xi):
            out, _, _ = vq.apply(variables, xi)
            return jnp.sum(out * 3.0)

        g = jax.grad(f)(x)
        np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones_like(g), rtol=1e-6)

    def test_masked_commitment_loss(self, rng):
        vq = self._make()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
        variables = vq.init({"params": rng}, x)
        mask_ones = jnp.ones((2, 4, 4, 1))
        _, loss_none, _ = vq.apply(variables, x)
        _, loss_ones, _ = vq.apply(variables, x, codebook_mask=mask_ones)
        np.testing.assert_allclose(float(loss_none), float(loss_ones), rtol=1e-6)
        _, loss_quarter, _ = vq.apply(variables, x, codebook_mask=0.25 * mask_ones)
        np.testing.assert_allclose(
            float(loss_quarter), 0.25 * float(loss_ones), rtol=1e-5
        )

    def test_ema_update_moves_codebook_toward_data(self, rng):
        vq = self._make(restart_unused_codes=False)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 8)) * 5.0
        variables = vq.init({"params": rng}, x)
        cb0 = variables["ema"]["codebook"]
        state = variables
        for step in range(30):
            _, mut = vq.apply(state, x, train=True, mutable=["ema"])
            state = {**state, "ema": mut["ema"]}
        cb1 = state["ema"]["codebook"]
        assert not np.allclose(np.asarray(cb0), np.asarray(cb1))
        # padding row untouched
        np.testing.assert_array_equal(np.asarray(cb1[-1]), 0.0)
        # quantization error should drop substantially after EMA adaptation
        _, loss0, _ = vq.apply(variables, x)
        _, loss1, _ = vq.apply(state, x)
        assert float(loss1) < float(loss0) * 0.5

    def test_restart_replaces_dead_codes(self, rng):
        vq = self._make(restart_unused_codes=True)
        x = jnp.ones((2, 4, 4, 8)) * 7.0  # all vectors identical -> 1 used code
        variables = vq.init({"params": rng}, x)
        _, mut = vq.apply(
            variables, x, train=True, mutable=["ema"], rngs={"vq": jax.random.PRNGKey(3)}
        )
        cs = np.asarray(mut["ema"]["cluster_size_ema"])
        # dead codes restarted with cluster size 1 (reference quantize2_mask.py:104-105)
        assert (cs >= 1.0 - 1e-6).sum() >= 31 or np.all(cs > 0)
        # restarted embeddings pulled from (noised) input vectors ~= 7.0
        emb = np.asarray(mut["ema"]["embed_ema"])
        dead_rows = emb[cs <= 1.0 + 1e-6]
        assert np.abs(dead_rows.mean() - 7.0) < 0.5

    def test_get_codebook_entry_padding_row(self, rng):
        vq = self._make()
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 8))
        variables = vq.init({"params": rng}, x)
        idx = jnp.array([[0, 32]])  # 32 == padding code
        emb = vq.apply(variables, idx, method="get_codebook_entry")
        np.testing.assert_array_equal(np.asarray(emb[0, 1]), 0.0)


def test_pallas_interpret_matches_xla(np_rng):
    """Cross-check the Pallas kernel logic in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(np_rng.normal(size=(1024, 256)).astype(np.float32))
    cb = jnp.asarray(np_rng.normal(size=(128, 256)).astype(np.float32))
    idx_ref, xq_ref = nearest_codes_xla(x, cb)
    try:
        with pltpu.force_tpu_interpret_mode():
            idx, xq, esum, csize = nearest_codes_with_stats(x, cb, use_pallas=True)
    except Exception as e:  # pragma: no cover - interpreter support varies
        pytest.skip(f"pallas interpret mode unavailable on CPU: {e}")
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(xq), np.asarray(xq_ref), rtol=1e-5, atol=1e-5)
    want_csize = np.bincount(np.asarray(idx_ref), minlength=128).astype(np.float32)
    np.testing.assert_allclose(np.asarray(csize), want_csize)

    # INFER variant (r04: idx-only kernel + external row gather), including a
    # non-tile-aligned N that exercises the zero-row padding path.
    for n in (1024, 1000):
        with pltpu.force_tpu_interpret_mode():
            idx_i, xq_i = nearest_codes(x[:n], cb, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(idx_i), np.asarray(idx_ref[:n]))
        # the gather returns codebook rows EXACTLY (bit-equal), stronger than
        # the train variant's matmul-selected rows
        np.testing.assert_array_equal(
            np.asarray(xq_i), np.asarray(cb)[np.asarray(idx_ref[:n])]
        )

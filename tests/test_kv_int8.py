"""int8 KV cache: quantizer error bound, chunked int8 decode attention vs
exact f32 attention, Pallas kernel vs XLA reference (interpret mode), and
end-to-end StackGPT decode with `kv_cache_dtype="int8"` tracking the f32
cached decode. The reference has no KV cache at all (stackgpt.py:234-340);
this is our TPU-native sampler optimization (ops/kv_int8.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.ops.kv_int8 import (
    _CHUNK,
    _decode_attention_int8_pallas,
    _decode_attention_int8_ref,
    quantize_kv,
)


def _exact_attention(q, k, v, cache_index):
    """Dense f32 masked softmax attention over the full cache."""
    hd = q.shape[-1]
    att = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / float(hd) ** 0.5
    pos = jnp.arange(k.shape[2])
    att = jnp.where(
        pos[None, None, None, :] <= cache_index, att, jnp.finfo(jnp.float32).min
    )
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v.astype(jnp.float32))


def test_quantize_kv_error_bound(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 3, 7, 16)).astype(np.float32)) * 4.0
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    deq = q.astype(jnp.float32) * s[..., None]
    # absmax rounding: |err| <= scale/2
    err = np.abs(np.asarray(deq - x))
    bound = np.asarray(s)[..., None] / 2 + 1e-6
    assert (err <= bound).all()


def test_int8_decode_attention_close_to_exact(np_rng):
    b, h, t, hd = 2, 3, 2 * _CHUNK, 32
    n_valid = _CHUNK + 37  # straddles a chunk boundary
    k = jnp.asarray(np_rng.normal(size=(b, h, t, hd)).astype(np.float32))
    v = jnp.asarray(np_rng.normal(size=(b, h, t, hd)).astype(np.float32))
    q = jnp.asarray(np_rng.normal(size=(b, h, 1, hd)).astype(np.float32))
    ki, ks = quantize_kv(k)
    vi, vs = quantize_kv(v)
    idx = jnp.int32(n_valid - 1)

    out = _decode_attention_int8_ref(q, ki, vi, ks, vs, idx)
    ref = _exact_attention(q, k, v, idx)
    # int8 error: ~0.4% per element on k (pre-softmax) and v (averaged)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05)
    # and it must differ from attention over the FULL buffer (mask works)
    full = _exact_attention(q, k, v, jnp.int32(t - 1))
    assert np.abs(np.asarray(ref - full)).max() > 0.05


def test_pallas_kernel_matches_ref_interpret(np_rng):
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, hd = 2, 2, 2 * _CHUNK, 32
    k = jnp.asarray(np_rng.normal(size=(b, h, t, hd)).astype(np.float32))
    v = jnp.asarray(np_rng.normal(size=(b, h, t, hd)).astype(np.float32))
    q = jnp.asarray(np_rng.normal(size=(b, h, 1, hd)).astype(np.float32))
    ki, ks = quantize_kv(k)
    vi, vs = quantize_kv(v)
    for n_valid in (5, _CHUNK, _CHUNK + 3, 2 * _CHUNK - 1):
        idx = jnp.int32(n_valid - 1)
        ref = _decode_attention_int8_ref(q, ki, vi, ks, vs, idx)
        try:
            with pltpu.force_tpu_interpret_mode():
                out = _decode_attention_int8_pallas(q, ki, vi, ks, vs, idx)
        except Exception as e:  # pragma: no cover - interpreter support varies
            pytest.skip(f"pallas interpret mode unavailable on CPU: {e}")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )


@pytest.mark.slow  # compile-dominated on the 1-CPU host (suite-trim r03)
def test_stackgpt_int8_decode_tracks_f32(rng):
    from tests.test_stackgpt import _streams, tiny_gpt

    b, lc, lf = 2, 5, 6
    streams = _streams(jax.random.PRNGKey(1), b, lc, lf)
    gpt32 = tiny_gpt()
    gpt8 = tiny_gpt(kv_cache_dtype="int8")
    variables = gpt32.init({"params": rng}, **streams)

    t = lc + lf - 1
    content_all = jnp.concatenate(
        [streams["coarse_content"], streams["fine_content"]], 1
    )

    def run(gpt):
        pos_cache, content_cache = gpt.apply(variables, b, t, method="make_caches")
        pos_logits, content_logits = [], []
        for i in range(t):
            is_fine = i >= lc
            tok_c = content_all[:, i]
            tok_p = (
                streams["fine_position"][:, i - lc]
                if is_fine
                else streams["coarse_position"][:, i]
            )
            seg = jnp.full((b,), 1 if is_fine else 0, jnp.int32)
            x = gpt.apply(
                variables, tok_c, tok_p, seg, jnp.int32(i), is_fine,
                method="embed_input_token",
            )
            hidden, pl_, pos_cache = gpt.apply(
                variables, x, pos_cache, jnp.int32(i), method="position_step"
            )
            next_is_fine = (i + 1) >= lc
            next_pos = (
                streams["fine_position"][:, i + 1 - lc]
                if next_is_fine
                else streams["coarse_position"][:, i + 1]
            )
            cl_, content_cache = gpt.apply(
                variables, hidden, next_pos, next_is_fine, content_cache,
                jnp.int32(i), method="content_step",
            )
            pos_logits.append(np.asarray(pl_))
            content_logits.append(np.asarray(cl_))
        return np.stack(pos_logits), np.stack(content_logits)

    p32, c32 = run(gpt32)
    p8, c8 = run(gpt8)
    for a, b_ in ((p32, p8), (c32, c8)):
        cos = np.sum(a * b_) / (np.linalg.norm(a) * np.linalg.norm(b_) + 1e-12)
        assert cos > 0.995, cos
        # int8 deviation stays well below the logit spread
        assert np.abs(a - b_).max() < 0.2 * (a.std() + 1e-12), (
            np.abs(a - b_).max(), a.std()
        )

"""Fused causal attention kernel (ops/attention_pallas.py) vs the naive
XLA path: forward + gradients, padding behavior, and dropout semantics.
Interpret mode on CPU; the compiled kernel runs on TPU in the stage-2 step.

Layout note: the kernel consumes (B, T, D) projection outputs directly
(its grid slices heads) — the reference comparison splits heads the
standard way."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.ops.attention_pallas import (
    fused_causal_attention,
)

H = 2


def _split(z, h):
    b, t, d = z.shape
    return z.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def _naive(q, k, v, h=H, scale=None):
    q, k, v = _split(q, h), _split(k, h), _split(v, h)
    hd = q.shape[-1]
    scale = scale or 1.0 / float(hd) ** 0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    t = q.shape[2]
    causal = jnp.tril(jnp.ones((t, t), bool))
    s = jnp.where(causal[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    y = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    b = y.shape[0]
    return y.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


@pytest.fixture
def force_qb_256(monkeypatch):
    """Pin the query block to 256 so T > 256 exercises the multi-block /
    partial-final-block paths (the default policy is full-T for T <= 1024)."""
    from dynamicvectorquantization_tpu.ops import attention_pallas as ap

    monkeypatch.setattr(ap, "_QB_ENV", "256")


@pytest.mark.parametrize("t", [256, 384, 300])  # 384/300: T % QB != 0 paths
def test_fused_attention_matches_naive(t, force_qb_256):
    b, d = 2, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, t, d), jnp.float32) for kk in ks)

    y = fused_causal_attention(q, k, v, 0, H, 0.0, None, True)
    y_ref = _naive(q, k, v)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("t", [256, 300])
def test_fused_attention_full_t_blocks(t):
    """Default policy: one grid step per (b, h) — incl. non-8-multiple T."""
    b, d = 2, 128
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (b, t, d), jnp.float32) for kk in ks)

    y = fused_causal_attention(q, k, v, 0, H, 0.0, None, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_naive(q, k, v)),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_noncausal_matches_naive():
    """causal=False single-head — the conv AttnBlock configuration."""
    b, t, d = 2, 300, 128
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (jax.random.normal(kk, (b, t, d), jnp.float32) for kk in ks)

    def naive_full(q, k, v):
        s = jnp.einsum("bic,bjc->bij", q, k).astype(jnp.float32) * (d ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bij,bjc->bic", p.astype(v.dtype), v)

    y = fused_causal_attention(q, k, v, 0, 1, 0.0, d ** -0.5, True, False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(naive_full(q, k, v)),
                               rtol=2e-5, atol=2e-5)

    gf = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(
            fused_causal_attention(q, k, v, 0, 1, 0.0, d ** -0.5, True, False)
        )), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(naive_full(q, k, v))),
        argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=2e-4)


def test_fused_attention_grads_match_naive(force_qb_256):
    b, t, d = 1, 300, 128  # partial final query block exercises row masking
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (b, t, d), jnp.float32) for kk in ks)

    def loss_fused(q, k, v):
        y = fused_causal_attention(q, k, v, 0, H, 0.0, None, True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_naive(q, k, v)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=2e-4)


def test_fused_attention_dropout_semantics():
    """rate>0 (interpret PRNG): same seed reproduces the same output (the
    fwd/bwd mask regeneration depends on that), different seeds differ, mean
    over seeds approaches the deterministic attention, grads flow."""
    b, t, d = 1, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (b, t, d), jnp.float32) for kk in ks)
    try:
        y1 = fused_causal_attention(q, k, v, 123, H, 0.5, None, True)
    except Exception as e:  # pragma: no cover - interpret-mode PRNG support
        pytest.skip(f"pallas interpret-mode PRNG unavailable: {e}")
    y2 = fused_causal_attention(q, k, v, 123, H, 0.5, None, True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = fused_causal_attention(q, k, v, 124, H, 0.5, None, True)
    assert not np.allclose(np.asarray(y1), np.asarray(y3))

    ys = [np.asarray(fused_causal_attention(q, k, v, s, H, 0.5, None, True))
          for s in range(40)]
    det = np.asarray(_naive(q, k, v))
    err = np.abs(np.mean(ys, axis=0) - det).mean() / np.abs(det).mean()
    assert err < 0.15, err

    g = jax.grad(
        lambda q: jnp.sum(
            fused_causal_attention(q, k, v, 7, H, 0.1, None, True)
        )
    )(q)
    assert np.isfinite(np.asarray(g)).all()

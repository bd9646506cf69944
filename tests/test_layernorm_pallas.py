"""Fused Pallas LayerNorm vs flax nn.LayerNorm (interpret mode on CPU).

Reference semantics: pre-LN transformer blocks
(`/root/reference/modules/dynamic_modules/stackgpt.py:17-96` use
torch.nn.LayerNorm, eps 1e-5); our flax baseline is the parity anchor.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.ops.layernorm_pallas import fused_layernorm


def _ref(x, g, b, eps=1e-5):
    ln = nn.LayerNorm(epsilon=eps)
    return ln.apply({"params": {"scale": g, "bias": b}}, x)


@pytest.mark.parametrize("shape", [(2, 300, 256), (700, 128), (2, 3, 256, 128)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_flax(shape, dtype):
    k = jax.random.PRNGKey(0)
    d = shape[-1]
    x = (jax.random.normal(k, shape) * 3 + 1).astype(dtype)
    g = jax.random.normal(jax.random.PRNGKey(1), (d,)) * 0.5 + 1
    b = jax.random.normal(jax.random.PRNGKey(2), (d,)) * 0.1

    y = fused_layernorm(x, g, b, 1e-5, True)
    y_ref = _ref(x, g, b)
    assert y.dtype == x.dtype
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=tol, atol=tol,
    )


@pytest.mark.parametrize("rows", [256, 300])  # exact tile + ragged tail
def test_grads_match_flax(rows):
    d = 256
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, d)) * 2
    g = jax.random.normal(jax.random.PRNGKey(1), (d,)) * 0.5 + 1
    b = jax.random.normal(jax.random.PRNGKey(2), (d,)) * 0.1
    dy = jax.random.normal(jax.random.PRNGKey(3), (rows, d))

    def loss_fused(x, g, b):
        return jnp.sum(fused_layernorm(x, g, b, 1e-5, True) * dy)

    def loss_ref(x, g, b):
        return jnp.sum(_ref(x, g, b) * dy)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for a, e, name in zip(got, want, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_module_fallback_matches_flax():
    """Off-TPU the module takes the plain-XLA branch; it must equal
    nn.LayerNorm bitwise-closely and expose the same param names."""
    from dynamicvectorquantization_tpu.nn.norm import FusedLayerNorm

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 33, 256), jnp.bfloat16)
    m = FusedLayerNorm(epsilon=1e-5)
    v = m.init(jax.random.PRNGKey(1), x)
    assert set(v["params"].keys()) == {"scale", "bias"}
    v = {
        "params": {
            "scale": jax.random.normal(jax.random.PRNGKey(2), (256,)) + 1,
            "bias": jax.random.normal(jax.random.PRNGKey(3), (256,)) * 0.1,
        }
    }
    y = m.apply(v, x)
    y_ref = nn.LayerNorm(epsilon=1e-5).apply(v, x)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    assert y.dtype == x.dtype

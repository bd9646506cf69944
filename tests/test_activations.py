"""nn/activations.gelu: f32 keeps exact erf GELU (reference-parity path);
bf16 takes the sigmoid-form tanh-GELU, which must stay within bf16 rounding
of the exact function."""
import jax
import jax.numpy as jnp
import numpy as np

from dynamicvectorquantization_tpu.nn.activations import gelu


def test_f32_is_exact_erf_gelu():
    x = jax.random.normal(jax.random.PRNGKey(0), (4096,), jnp.float32) * 3
    np.testing.assert_array_equal(
        np.asarray(gelu(x)), np.asarray(jax.nn.gelu(x, approximate=False))
    )


def test_bf16_within_bf16_rounding_of_exact():
    x = jax.random.normal(jax.random.PRNGKey(1), (1 << 18,), jnp.bfloat16) * 3
    exact = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
    fast = gelu(x).astype(jnp.float32)
    # pure-rounding baseline: exact erf GELU evaluated in bf16
    erf_bf16 = jax.nn.gelu(x, approximate=False).astype(jnp.float32)
    err_fast = float(jnp.max(jnp.abs(fast - exact)))
    err_round = float(jnp.max(jnp.abs(erf_bf16 - exact)))
    # the fast form may not add more than ~1.5x the unavoidable rounding error
    assert err_fast <= 1.5 * max(err_round, 1e-3), (err_fast, err_round)


def test_bf16_matches_tanh_form():
    x = jax.random.normal(jax.random.PRNGKey(2), (1 << 16,), jnp.bfloat16) * 3
    ours = gelu(x).astype(jnp.float32)
    tanh_form = jax.nn.gelu(x.astype(jnp.float32), approximate=True)
    # identical math up to sigmoid-vs-tanh evaluation order
    assert float(jnp.max(jnp.abs(ours - tanh_form))) < 2e-2

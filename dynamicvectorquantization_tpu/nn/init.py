"""Weight initializers matching the reference's torch init conventions."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def trunc_normal_init(std: float = 1.0, mean: float = 0.0, a: float = -2.0, b: float = 2.0):
    """Truncated normal via inverse-CDF (reference
    `modules/dynamic_modules/tools.py:5-69`, the timm/torch recipe):
    sample uniform in [cdf(a'), cdf(b')], apply erfinv, scale, clamp."""

    def init(key, shape, dtype=jnp.float32):
        def norm_cdf(x):
            return (1.0 + jax.scipy.special.erf(x / jnp.sqrt(2.0))) / 2.0

        lo = norm_cdf((a - mean) / std)
        hi = norm_cdf((b - mean) / std)
        u = jax.random.uniform(key, shape, dtype, 2 * lo - 1, 2 * hi - 1)
        x = jax.scipy.special.erfinv(u)
        x = x * std * jnp.sqrt(2.0) + mean
        return jnp.clip(x, a, b)

    return init


def normal_init(std: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


def uniform_init(lo: float, hi: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, lo, hi)

    return init

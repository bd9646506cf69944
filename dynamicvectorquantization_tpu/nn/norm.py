"""LayerNorm module that dispatches to the fused Pallas kernel on TPU.

Drop-in for `nn.LayerNorm` (same param names "scale"/"bias", same f32
statistics semantics) so checkpoints and the torch converter are unaffected.
Falls back to plain XLA math off-TPU, for feature dims that do not tile the
128-lane VPU, or for tiny row counts (single-token decode) where the
pallas_call dispatch outweighs the fusion.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_MIN_ROWS = 256  # below this (e.g. KV-cached decode, t == 1) XLA wins


class FusedLayerNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        rows = x.size // d
        if (
            jax.default_backend() == "tpu"
            and d % 128 == 0
            and rows >= _MIN_ROWS
        ):
            from ..ops.layernorm_pallas import fused_layernorm

            return fused_layernorm(x, scale, bias, self.epsilon)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
            x.dtype
        )

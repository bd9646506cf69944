"""StyleGAN-style discriminator (legacy alternative to the PatchGAN).

Reference: `modules/discriminator/stylegan.py` /
`stylegan_lucidrains.py` — residual down-blocks with leaky ReLU, a minibatch
stddev feature, and a dense head. Functional NHWC re-design (no equalized-lr
tricks; plain convs with normal init as the lucidrains variant uses).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .init import normal_init


def _leaky(x):
    return nn.leaky_relu(x, 0.2)


class _ResDown(nn.Module):
    ch_out: int

    @nn.compact
    def __call__(self, x):
        skip = nn.Conv(self.ch_out, (1, 1), strides=(2, 2), use_bias=False,
                       kernel_init=normal_init(0.02), name="skip")(x)
        h = _leaky(nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                           kernel_init=normal_init(0.02), name="conv1")(x))
        h = _leaky(nn.Conv(self.ch_out, (3, 3), strides=(2, 2), padding="SAME",
                           kernel_init=normal_init(0.02), name="conv2")(h))
        return (h + skip) / jnp.sqrt(2.0)


def minibatch_stddev(x, group_size: int = 4):
    b, h, w, c = x.shape
    g = min(group_size, b)
    g = b // (b // g) if b % g else g
    while b % g:
        g -= 1
    y = x.reshape(g, b // g, h, w, c)
    std = jnp.sqrt(jnp.var(y, axis=0) + 1e-8)
    mean_std = jnp.mean(std, axis=(1, 2, 3), keepdims=True)
    feat = jnp.broadcast_to(
        jnp.repeat(mean_std, g, axis=0).reshape(b, 1, 1, 1), (b, h, w, 1)
    )
    return jnp.concatenate([x, feat], axis=-1)


class StyleGANDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 4
    image_size: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _leaky(nn.Conv(self.ndf, (3, 3), padding="SAME",
                           kernel_init=normal_init(0.02), name="conv_in")(x))
        ch = self.ndf
        for i in range(self.n_layers):
            ch = min(ch * 2, 512)
            h = _ResDown(ch, name=f"down_{i}")(h)
        h = minibatch_stddev(h)
        h = _leaky(nn.Conv(ch, (3, 3), padding="SAME",
                           kernel_init=normal_init(0.02), name="conv_out")(h))
        h = h.reshape(h.shape[0], -1)
        h = _leaky(nn.Dense(ch, kernel_init=normal_init(0.02), name="fc")(h))
        return nn.Dense(1, kernel_init=normal_init(0.02), name="out")(h)

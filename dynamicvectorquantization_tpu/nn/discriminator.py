"""PatchGAN discriminator (pix2pix NLayerDiscriminator).

Reference: `modules/discriminator/model.py:17-67` — 4x4 convs, stride 2 for
the first n_layers, BatchNorm (or ActNorm), LeakyReLU(0.2), final 1-channel
map. Convs feeding BatchNorm drop their bias (BN has affine params).
`weights_init` (normal 0.02 convs / BN scale normal(1.0, 0.02)) applied when
``disc_init`` is set in the loss config.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .init import normal_init


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init (reference
    `utils/utils.py:58-140`): at module init (= the reference's first training
    forward) loc/scale are set so the first batch's channels come out
    zero-mean unit-std; afterwards they are ordinary learned params.

    Flax-native DDI: the param initializers close over the init-time input —
    equivalent to torch's initialized-flag buffer, but without carrying
    mutable state through every apply. `reverse=True` inverts the affine
    (reference `ActNorm.reverse`); `logdet=True` additionally returns the
    flow log-determinant.
    """

    logdet: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, reverse: bool = False):
        c = x.shape[-1]
        flat = x.reshape(-1, c)

        def init_loc(_rng):
            return -jnp.mean(flat, axis=0)

        def init_scale(_rng):
            # torch .std(): Bessel-corrected
            std = jnp.std(flat, axis=0, ddof=1 if flat.shape[0] > 1 else 0)
            return 1.0 / (std + 1e-6)

        loc = self.param("loc", init_loc)
        scale = self.param("scale", init_scale)
        if reverse:
            return x / scale - loc
        h = (x + loc) * scale
        if self.logdet:
            hw = int(np.prod(x.shape[1:-1])) if x.ndim > 2 else 1
            log_abs = jnp.log(jnp.abs(scale))
            logdet = hw * jnp.sum(log_abs) * jnp.ones(x.shape[0], x.dtype)
            return h, logdet
        return h


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw, padw = 4, 1
        pad = [(0, 0), (padw, padw), (padw, padw), (0, 0)]

        def conv(ch, stride, use_bias, name):
            return nn.Conv(
                ch,
                (kw, kw),
                strides=(stride, stride),
                padding="VALID",
                use_bias=use_bias,
                kernel_init=normal_init(0.02),
                name=name,
            )

        def norm(h, name):
            if self.use_actnorm:
                return ActNorm(name=name)(h, train=train)
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                scale_init=normal_init(0.02) if False else nn.initializers.ones,
                name=name,
            )(h)

        use_bias = self.use_actnorm  # BatchNorm has affine -> no conv bias

        h = conv(self.ndf, 2, True, "conv_0")(jnp.pad(x, pad))
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = conv(self.ndf * nf_mult, 2, use_bias, f"conv_{n}")(jnp.pad(h, pad))
            h = norm(h, f"norm_{n}")
            h = nn.leaky_relu(h, 0.2)

        nf_mult = min(2**self.n_layers, 8)
        h = conv(self.ndf * nf_mult, 1, use_bias, f"conv_{self.n_layers}")(
            jnp.pad(h, pad)
        )
        h = norm(h, f"norm_{self.n_layers}")
        h = nn.leaky_relu(h, 0.2)
        return conv(1, 1, True, "conv_out")(jnp.pad(h, pad))

"""StyleGAN-family discriminators (legacy alternatives to the PatchGAN).

Two faithful NHWC re-designs of the reference's config-instantiable
discriminators (selected via `disc_config` in
`modules/losses/vqperceptual_multidisc.py:74`):

* ``StyleGAN2Discriminator`` — reference `modules/discriminator/stylegan.py:
  283-357`: residual down-blocks (1x1 strided skip; 3x3/3x3 tower; blur +
  strided 3x3 downsample; /sqrt(2) merge), optional linear-attention +
  conv-FF stages at chosen resolutions, a final 3x3 conv and a dense head
  over the 2x2 tail.
* ``LucidrainsDiscriminator`` — reference
  `modules/discriminator/stylegan_lucidrains.py:85-126`: cross-embed stem
  (parallel 3/7/15 convs), strided 4x4 down-stages with GroupNorm +
  ResnetBlock, PatchGAN-style 4x4-VALID logit head.

Both load reference torch checkpoints through
`utils/torch_ckpt.convert_stylegan2_disc_state_dict` /
`convert_lucidrains_disc_state_dict` (parity-tested against torch replicas
in `tests/test_stylegan_parity.py`).
"""
from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .activations import gelu


def _leaky(x, slope=0.2):
    return nn.leaky_relu(x, slope)


def blur_3x3(x):
    """kornia.filters.filter2d with the normalized [1,2,1] outer-product
    kernel (reference stylegan.py:104-112): reflect pad 1, depthwise."""
    f1 = jnp.array([1.0, 2.0, 1.0], dtype=x.dtype)
    k = jnp.outer(f1, f1)
    k = k / jnp.sum(k)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # depthwise: (H,W,1,C) kernel with feature_group_count=C
    c = x.shape[-1]
    kern = jnp.broadcast_to(k[:, :, None, None], (3, 3, 1, c))
    import jax.lax as lax

    return lax.conv_general_dilated(
        xp, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


class ChanNorm(nn.Module):
    """Per-pixel channel norm with biased variance (stylegan.py:73-83)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps) * g + b


class LinearAttention(nn.Module):
    """Softmax-kernel linear attention over the feature map
    (stylegan.py:126-153): 1x1 q, depthwise-3x3 + 1x1 kv, per-head
    d x e context, exact-GELU nonlinearity, 1x1 out."""

    dim: int
    dim_head: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        b, hh, ww, _ = x.shape
        inner = self.dim_head * self.heads
        q = nn.Conv(inner, (1, 1), use_bias=False, name="to_q")(x)
        kv = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                     feature_group_count=self.dim, use_bias=False,
                     name="to_kv_dw")(x)
        kv = nn.Conv(inner * 2, (1, 1), use_bias=False, name="to_kv_pw")(kv)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            t = t.reshape(b, hh * ww, self.heads, self.dim_head)
            return jnp.transpose(t, (0, 2, 1, 3))  # (b, h, n, d)

        q, k, v = map(heads_first, (q, k, v))
        q = nn.softmax(q, axis=-1) * (self.dim_head ** -0.5)
        k = nn.softmax(k, axis=-2)
        context = jnp.einsum("bhnd,bhne->bhde", k, v)
        out = jnp.einsum("bhnd,bhde->bhne", q, context)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, hh, ww, inner)
        out = gelu(out)  # dtype-gated fast GELU (nn/activations.py)
        return nn.Conv(self.dim, (1, 1), name="to_out")(out)


class _AttnFF(nn.Module):
    """attn_and_ff(chan) (stylegan.py:157-160): Residual(PreNorm(attn)) then
    Residual(PreNorm(1x1 -> 2x -> leaky -> 1x1))."""

    dim: int

    @nn.compact
    def __call__(self, x):
        h = ChanNorm(self.dim, name="attn_norm")(x)
        x = x + LinearAttention(self.dim, name="attn")(h)
        h = ChanNorm(self.dim, name="ff_norm")(x)
        h = nn.Conv(self.dim * 2, (1, 1), name="ff_conv1")(h)
        h = _leaky(h)
        h = nn.Conv(self.dim, (1, 1), name="ff_conv2")(h)
        return x + h


class DiscriminatorBlock(nn.Module):
    """stylegan.py:283-306 (explicit torch-style paddings so strided shapes
    match the reference exactly)."""

    filters: int
    downsample: bool = True

    @nn.compact
    def __call__(self, x):
        stride = (2, 2) if self.downsample else (1, 1)
        res = nn.Conv(self.filters, (1, 1), strides=stride, name="conv_res")(x)
        h = _leaky(nn.Conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                           name="net_conv1")(x))
        h = _leaky(nn.Conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                           name="net_conv2")(h))
        if self.downsample:
            h = blur_3x3(h)
            h = nn.Conv(self.filters, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], name="down_conv")(h)
        return (h + res) * (1.0 / math.sqrt(2.0))


class StyleGAN2Discriminator(nn.Module):
    """Reference `modules/discriminator/stylegan.py:308-357` Discriminator."""

    image_size: int = 256
    network_capacity: int = 16
    attn_layers: Sequence[int] = ()
    transparent: bool = False
    fmap_max: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_layers = int(math.log2(self.image_size) - 1)
        init_ch = 4 if self.transparent else 3
        filters = [init_ch] + [
            min((self.network_capacity * 4) * (2 ** i), self.fmap_max)
            for i in range(num_layers + 1)
        ]
        pairs = list(zip(filters[:-1], filters[1:]))
        for ind, (_, ch_out) in enumerate(pairs):
            is_not_last = ind != len(pairs) - 1
            x = DiscriminatorBlock(ch_out, downsample=is_not_last,
                                   name=f"blocks_{ind}")(x)
            if (ind + 1) in tuple(self.attn_layers):
                x = _AttnFF(ch_out, name=f"attn_{ind}")(x)
        x = nn.Conv(filters[-1], (3, 3), padding=[(1, 1), (1, 1)],
                    name="final_conv")(x)
        x = x.reshape(x.shape[0], -1)  # NHWC flatten; converter permutes
        x = nn.Dense(1, name="to_logit")(x)
        return jnp.squeeze(x, -1)


class CrossEmbedLayer(nn.Module):
    """stylegan_lucidrains.py:22-47: parallel odd-kernel convs whose output
    dims halve per scale, concatenated."""

    dim_out: int
    kernel_sizes: Sequence[int] = (3, 7, 15)
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        ks = sorted(self.kernel_sizes)
        dim_scales = [self.dim_out // (2 ** i) for i in range(1, len(ks))]
        dim_scales = dim_scales + [self.dim_out - sum(dim_scales)]
        outs = []
        for j, (k, d) in enumerate(zip(ks, dim_scales)):
            p = (k - self.stride) // 2
            outs.append(
                nn.Conv(d, (k, k), strides=(self.stride, self.stride),
                        padding=[(p, p), (p, p)], name=f"convs_{j}")(x)
            )
        return jnp.concatenate(outs, axis=-1)


class LucidrainsDiscriminator(nn.Module):
    """Reference `modules/discriminator/stylegan_lucidrains.py:85-126`:
    cross-embed stem, strided 4x4 stages (leaky 0.1, GroupNorm, ResnetBlock),
    PatchGAN logit head (1x1 then 4x4 VALID)."""

    dim: int = 256
    discr_layers: int = 6
    channels: int = 3
    groups: int = 8
    cross_embed_kernel_sizes: Sequence[int] = (3, 7, 15)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = [self.dim * (2 ** t) for t in range(self.discr_layers)]
        dims = [self.dim] + dims
        x = CrossEmbedLayer(self.dim, self.cross_embed_kernel_sizes, stride=1,
                            name="layer0_cross_embed")(x)
        x = _leaky(x, 0.1)
        for i, d_out in enumerate(dims[1:]):
            x = nn.Conv(d_out, (4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], name=f"layers_{i}_conv")(x)
            x = _leaky(x, 0.1)
            x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             name=f"layers_{i}_norm")(x)
            # ResnetBlock(d_out, d_out): res_conv is Identity (dims equal)
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             name=f"layers_{i}_res_groupnorm")(x)
            h = _leaky(h, 0.1)
            h = nn.Conv(d_out, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"layers_{i}_res_project")(h)
            x = x + h
        x = nn.Conv(dims[-1], (1, 1), name="logits_conv1")(x)
        x = _leaky(x, 0.1)
        return nn.Conv(1, (4, 4), padding="VALID", name="logits_conv2")(x)

"""Mask-aware attention decoder (reference
`modules/diffusionmodules/attn_model.py:12-340`).

A VQGAN-style decoder whose middle is a `TokenReconstruction` stack:
[resnet_k1, {(biased-)self-attn, resnet_k1} x n_layer] where the attention
can be reweighted by a per-position mask that anneals toward 1 across layers
(mask_update_mode square/cube/linear/const). Used by the reference's masked
token-reconstruction experiments; no shipped config instantiates it, but the
class is part of the public `target:` surface.

NHWC, flax; attention is a single-head 1x1-projected softmax over H*W
positions, matching the reference math (einsum form instead of bmm chains).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import AttnBlock, Normalize, ResnetBlock, Upsample, nonlinearity


class ResnetBlockK1(nn.Module):
    """ResnetBlock with configurable (1 or 3) conv kernel
    (reference `attn_model.py:12-76`)."""

    in_channels: int
    out_channels: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    kernel_size: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, **_):
        out_ch = self.out_channels or self.in_channels
        k = (self.kernel_size, self.kernel_size)
        h = nonlinearity(Normalize(self.in_channels, name="norm1")(x))
        h = nn.Conv(out_ch, k, padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = nonlinearity(Normalize(out_ch, name="norm2")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(out_ch, k, padding="SAME", dtype=self.dtype, name="conv2")(h)
        if self.in_channels != out_ch:
            name = "conv_shortcut" if self.conv_shortcut else "nin_shortcut"
            sk = k if self.conv_shortcut else (1, 1)
            x = nn.Conv(out_ch, sk, padding="SAME", dtype=self.dtype, name=name)(x)
        return x + h


class MaskedSelfAttnBlock(nn.Module):
    """Self-attention over H*W with optional post-softmax mask multiply
    (reference SelfAttnBlock / BiasedSelfAttnBlock, `attn_model.py:78-178`).

    mask: (B, H*W) weight per KEY position, multiplied into the softmaxed
    attention rows; ``reweight=True`` renormalizes rows afterwards.
    """

    in_channels: int
    reweight: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, **_):
        b, hgt, wid, c = x.shape
        h_ = Normalize(self.in_channels, name="norm")(x)
        proj = lambda name: nn.Conv(c, (1, 1), dtype=self.dtype, name=name)
        q = proj("q")(h_).reshape(b, hgt * wid, c)
        k = proj("k")(h_).reshape(b, hgt * wid, c)
        v = proj("v")(h_).reshape(b, hgt * wid, c)

        att = jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5)
        att = jax.nn.softmax(att, axis=2)
        if mask is not None:
            att = att * mask[:, None, :]
            if self.reweight:
                att = att / jnp.sum(att, axis=-1, keepdims=True)
        h_ = jnp.einsum("bqk,bkc->bqc", att, v).reshape(b, hgt, wid, c)
        h_ = proj("proj_out")(h_)
        return x + h_


class TokenReconstruction(nn.Module):
    """[resnet_k1, {attn, resnet_k1} x n_layer] with mask annealing
    (reference `attn_model.py:179-238`)."""

    n_layer: int
    input_dim: int
    dropout: float = 0.0
    attn_type: str = "self-attn"
    resnet_kernel_size: int = 1
    mask_update_mode: str = "square"
    reweight: bool = False
    fix_bug: bool = False  # reference flag: kernel_size on inner resnets
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        assert self.attn_type in ("self-attn", "bias-self-attn")
        biased = self.attn_type == "bias-self-attn"
        if mask is not None and self.mask_update_mode in ("square", "cube"):
            mask = mask + 0.02 * (1 - mask)
        original_mask = mask
        gain = 1.0 / max(self.n_layer - 1, 1)

        x = ResnetBlockK1(
            in_channels=self.input_dim, dropout=self.dropout,
            kernel_size=self.resnet_kernel_size, dtype=self.dtype, name="res_in",
        )(x, deterministic=deterministic)
        for i in range(self.n_layer):
            x = MaskedSelfAttnBlock(
                self.input_dim, reweight=self.reweight, dtype=self.dtype,
                name=f"attn_{i}",
            )(x, mask=mask if biased else None)
            inner_k = self.resnet_kernel_size if self.fix_bug else 1
            x = ResnetBlockK1(
                in_channels=self.input_dim, dropout=self.dropout,
                kernel_size=inner_k, dtype=self.dtype, name=f"res_{i}",
            )(x, deterministic=deterministic)
            if mask is not None:
                if self.mask_update_mode == "square":
                    mask = jnp.sqrt(mask)
                elif self.mask_update_mode == "cube":
                    mask = jnp.power(mask, 1.0 / 3.0)
                elif self.mask_update_mode == "linear":
                    mask = original_mask + (i + 1) * gain * (1 - original_mask)
                elif self.mask_update_mode != "const":
                    raise ValueError(self.mask_update_mode)
        return x


class AttnDecoder(nn.Module):
    """VQGAN decoder with a TokenReconstruction middle
    (reference `attn_model.py:241-340`)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3  # parity field (unused, as upstream)
    resolution: int = 256
    z_channels: int = 256
    give_pre_end: bool = False
    token_n_layer: int = 6
    token_attn_type: str = "self-attn"
    resnet_kernel_size: int = 1
    mask_update_mode: str = "square"
    reweight: bool = False
    fix_bug: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, z, mask=None, deterministic: bool = True):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_res - 1]
        curr_res = self.resolution // 2 ** (num_res - 1)

        h = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(z)
        h = TokenReconstruction(
            n_layer=self.token_n_layer, input_dim=block_in,
            dropout=self.dropout, attn_type=self.token_attn_type,
            resnet_kernel_size=self.resnet_kernel_size,
            mask_update_mode=self.mask_update_mode, reweight=self.reweight,
            fix_bug=self.fix_bug, dtype=self.dtype, name="mid",
        )(h, mask=mask, deterministic=deterministic)

        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, deterministic=deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(block_in, dtype=self.dtype,
                                  name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(block_in, self.resamp_with_conv, dtype=self.dtype,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        if self.give_pre_end:
            return h
        h = nonlinearity(Normalize(block_in, name="norm_out")(h))
        return nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_out")(h)

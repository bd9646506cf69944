"""Single-grain VQGAN Encoder/Decoder (legacy baseline family).

Reference: `modules/diffusionmodules/model.py:342-520` (Encoder, Decoder) —
the standard taming-transformers codec used by the fixed-length VQGAN /
multi-VQ / RQ-VAE baselines (`models/stage1/`). Reuses the same NHWC blocks
as the dynamic codec.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from .blocks import AttnBlock, Downsample, GroupNorm32, ResnetBlock, Upsample, nonlinearity


class VQGANEncoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 256
    double_z: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_res = len(self.ch_mult)
        in_ch_mult = (1,) + tuple(self.ch_mult)
        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(x)
        curr_res = self.resolution
        block_in = self.ch
        for i_level in range(num_res):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h, deterministic=deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(block_in, dtype=self.dtype,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_res - 1:
                h = Downsample(block_in, self.resamp_with_conv, dtype=self.dtype,
                               name=f"down_{i_level}_downsample")(h)
                curr_res //= 2

        h = ResnetBlock(in_channels=block_in, dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(block_in, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(in_channels=block_in, dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, deterministic=deterministic)

        h = GroupNorm32(name="norm_out")(h)
        h = nonlinearity(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding="SAME", name="conv_out")(h)


class VQGANDecoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3  # unused; parity with reference ctor
    out_ch: int = 3
    resolution: int = 256
    z_channels: int = 256
    give_pre_end: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, z, deterministic: bool = True, return_pre_out: bool = False):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_res - 1]
        curr_res = self.resolution // 2 ** (num_res - 1)

        h = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(in_channels=block_in, dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(block_in, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(in_channels=block_in, dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, deterministic=deterministic)

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
        h = GroupNorm32(name="norm_out")(h)
        h = nonlinearity(h)
        out = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv_out")(h)
        if return_pre_out:
            return out, h
        return out

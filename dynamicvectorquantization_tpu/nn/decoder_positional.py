"""DQ-VAE decoder with position injection on the quantized latent.

Reference: `modules/dynamic_modules/DecoderPositional.py:41-145` — a VQGAN
up-stack that first adds positional information to the latent, because
variable-grain quantization erases positional identity of coarse regions.
Supported ``position_type``: "fourier", "learned", "fourier+learned" (the
shipped configs use "fourier+learned"), "learned-relative", and "none"
(plain dynamic decoder, `modules/dynamic_modules/Decoder.py`).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from .blocks import AttnBlock, GroupNorm32, ResnetBlock, Upsample, nonlinearity
from .fourier import FourierPositionEmbedding, PositionEmbedding2DLearned


class PositionalDecoder(nn.Module):
    ch: int = 128
    in_ch: int = 256
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 1, 2, 2)
    num_res_blocks: int = 2
    resolution: int = 256
    attn_resolutions: Sequence[int] = (32,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    give_pre_end: bool = False
    latent_size: int = 32
    window_size: int = 2
    position_type: str = "fourier+learned"
    dtype: Any = None  # bf16 compute path for the conv stack (params stay f32)

    @nn.compact
    def __call__(
        self,
        h,
        grain_indices=None,
        deterministic: bool = True,
        return_pre_out: bool = False,
    ):
        """Decode a latent to an image.

        With ``return_pre_out=True`` also returns the activation feeding the
        final conv (`swish(norm_out(h))`): the stage-1 loss needs gradients of
        nll/g_loss w.r.t. the last conv kernel for the adaptive discriminator
        weight (reference `vqperceptual_multidisc.py:102-113`), which we
        compute as a VJP of `conv(pre_out, w_last)` without re-running the
        whole decoder."""
        if self.position_type == "fourier":
            h = FourierPositionEmbedding(
                self.latent_size, self.in_ch, name="position_bias_fourier"
            )(h)
        elif self.position_type == "learned":
            h = PositionEmbedding2DLearned(
                self.latent_size, self.in_ch, name="position_bias_learned"
            )(h)
        elif self.position_type == "fourier+learned":
            h = FourierPositionEmbedding(
                self.latent_size, self.in_ch, name="position_bias_fourier"
            )(h)
            h = PositionEmbedding2DLearned(
                self.latent_size, self.in_ch, name="position_bias_learned"
            )(h)
        elif self.position_type == "learned-relative":
            # shared per-window embedding added to each window
            b, hh, ww, c = h.shape
            n = self.latent_size // self.window_size
            hw = self.window_size
            x = h.reshape(b, n, hw, n, hw, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b * n * n, hw, hw, c)
            x = PositionEmbedding2DLearned(hw, self.in_ch, name="position_bias_learned")(x)
            x = x.reshape(b, n, n, hw, hw, c).transpose(0, 1, 3, 2, 4, 5)
            h = x.reshape(b, hh, ww, c)
        elif self.position_type == "none":
            pass
        else:
            raise NotImplementedError(self.position_type)

        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_res - 1]
        curr_res = self.resolution // 2 ** (num_res - 1)

        h = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(h)
        h = ResnetBlock(in_channels=block_in, dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(block_in, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(in_channels=block_in, dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, deterministic=deterministic)

        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    in_channels=block_in,
                    out_channels=block_out,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, deterministic=deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(block_in, dtype=self.dtype, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(block_in, self.resamp_with_conv, dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        if self.give_pre_end:
            return h

        h = GroupNorm32(name="norm_out")(h)
        h = nonlinearity(h)
        out = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv_out")(h)
        if return_pre_out:
            return out, h
        return out

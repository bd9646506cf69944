"""Dual-grain encoder: shared conv-ResNet down-stack with F=16 (coarse) and
F=8 (fine) heads merged by a granularity router.

Reference semantics (`modules/dynamic_modules/EncoderDual.py:15-155`):
  * shared down-stack; the fine tap is the block output at level
    ``num_resolutions - 2`` (before that level's downsample); the coarse tap
    is the final level output through its own mid/norm/out head;
  * router gate -> (training + ``update_router``) straight-through
    gumbel-softmax; ``indices = argmax(gate)`` (0 coarse / 1 fine);
  * coarse features upsampled x2 (repeat) and merged with a dense
    `where(indices==0, coarse, fine)` at the fine resolution — static shapes,
    already XLA-friendly;
  * during router training the merged map is scaled by ``max(gate)`` so the
    gate receives gradients;
  * per-position commitment weights: 0.25 coarse / 1.0 fine.

NHWC layout. Gumbel randomness comes from the flax rng stream "gumbel".
"""
from __future__ import annotations

from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.instantiate import instantiate_from_config
from .blocks import AttnBlock, Downsample, GroupNorm32, ResnetBlock, nonlinearity


def gumbel_softmax_st(key, logits, tau: float = 1.0, axis: int = -1):
    """Straight-through hard gumbel-softmax (torch F.gumbel_softmax(hard=True))."""
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=axis)
    idx = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(idx, logits.shape[axis], axis=axis, dtype=logits.dtype)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


def repeat2d(x, factor: int):
    """Nearest-neighbor spatial repeat for NHWC (torch repeat_interleave on H,W)."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


class DownStack(nn.Module):
    """Shared VQGAN down-stack; returns the tap features at each level."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    dropout: float
    resamp_with_conv: bool
    resolution: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_res = len(self.ch_mult)
        in_ch_mult = (1,) + tuple(self.ch_mult)
        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(x)
        curr_res = self.resolution
        taps = {}
        for i_level in range(num_res):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    in_channels=block_in,
                    out_channels=block_out,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h, deterministic=deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(block_in, dtype=self.dtype, name=f"down_{i_level}_attn_{i_block}")(h)
            taps[i_level] = h  # post-blocks, pre-downsample
            if i_level != num_res - 1:
                h = Downsample(
                    block_in, self.resamp_with_conv, dtype=self.dtype,
                    name=f"down_{i_level}_downsample"
                )(h)
                curr_res //= 2
        taps["final"] = h
        return taps


class GrainHead(nn.Module):
    """mid (Res-Attn-Res) + GroupNorm + swish + 3x3 out conv."""

    block_in: int
    z_channels: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, h, deterministic: bool = True):
        h = ResnetBlock(
            in_channels=self.block_in, dropout=self.dropout, dtype=self.dtype,
            name="mid_block_1"
        )(h, deterministic=deterministic)
        h = AttnBlock(self.block_in, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(
            in_channels=self.block_in, dropout=self.dropout, dtype=self.dtype,
            name="mid_block_2"
        )(h, deterministic=deterministic)
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = nonlinearity(h)
        # conv_out follows the compute dtype: on the bf16 path the f32
        # variant cost ~1.8 GFLOP/img of quarter-rate f32 MXU work plus a
        # bf16->f32 cast of the head activations (~1.7 ms/batch-64 measured
        # r05). Downstream consumers are unaffected in kind: the VQ distance
        # kernel casts to f32 + Precision.HIGHEST either way, and the bf16
        # path is already a documented-deviation mode (QUIRKS #23). The f32
        # default path (dtype=None) — and every torch-parity test — is
        # unchanged.
        return nn.Conv(self.z_channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv_out")(h)


class DualGrainEncoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16, 32)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 256
    router_config: Mapping[str, Any] | None = None
    update_router: bool = True
    dtype: Any = None  # bf16 compute path for the conv stack (params stay f32)

    # commitment weight per grain: 1 coarse code covers 4 fine positions
    coarse_commit_weight: float = 0.25
    fine_commit_weight: float = 1.0

    def setup(self):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        block_in_fine = block_in // (self.ch_mult[-1] // self.ch_mult[-2])
        self.down = DownStack(
            ch=self.ch,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            dropout=self.dropout,
            resamp_with_conv=self.resamp_with_conv,
            resolution=self.resolution,
            dtype=self.dtype,
        )
        self.head_coarse = GrainHead(block_in, self.z_channels, self.dropout, self.dtype)
        self.head_fine = GrainHead(block_in_fine, self.z_channels, self.dropout, self.dtype)
        self.router = instantiate_from_config(self.router_config)
        self._num_res = num_res

    def __call__(self, x, x_entropy=None, train: bool = False):
        assert x.shape[1] == x.shape[2] == self.resolution, x.shape
        deterministic = not train
        taps = self.down(x, deterministic=deterministic)
        h_coarse = self.head_coarse(taps["final"], deterministic=deterministic)
        h_fine = self.head_fine(taps[self._num_res - 2], deterministic=deterministic)

        gate = self.router(h_fine=h_fine, h_coarse=h_coarse, entropy=x_entropy)
        if self.update_router and train:
            gate = gumbel_softmax_st(self.make_rng("gumbel"), gate.astype(jnp.float32))
        indices = jnp.argmax(gate, axis=-1)  # (B, Hc, Wc)

        h_coarse_up = repeat2d(h_coarse, 2)
        indices_rep = repeat2d(indices[..., None], 2)  # (B, Hf, Wf, 1)
        h_dual = jnp.where(indices_rep == 0, h_coarse_up, h_fine)

        if self.update_router and train:
            gate_grad = jnp.max(gate, axis=-1, keepdims=True)
            h_dual = h_dual * repeat2d(gate_grad, 2)

        codebook_mask = jnp.where(
            indices_rep == 0, self.coarse_commit_weight, self.fine_commit_weight
        ).astype(h_dual.dtype)

        return {
            "h_dual": h_dual,  # (B, Hf, Wf, z)
            "indices": indices,  # (B, Hc, Wc)
            "codebook_mask": codebook_mask,  # (B, Hf, Wf, 1)
            "gate": gate,  # (B, Hc, Wc, 2)
        }

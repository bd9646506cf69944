"""Triple-grain encoder: F=32/16/8 taps merged by a 3-way router.

Reference semantics (`modules/dynamic_modules/EncoderTriple.py:95-183`):
taps at levels num_res-1 (coarse, final), num_res-2 (median), num_res-3
(fine); repeat factors 4/2; commitment masks 0.0625/0.25/1.0. Unlike the
dual encoder, the triple variant applies gumbel whenever training (there is
no ``update_router`` flag gating it — `EncoderTriple.py:146` vs
`EncoderDual.py:132`).
"""
from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..utils.instantiate import instantiate_from_config
from .encoder_dual import DownStack, GrainHead, gumbel_softmax_st, repeat2d


class TripleGrainEncoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16, 32)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 256
    router_config: Mapping[str, Any] | None = None
    dtype: Any = None

    coarse_commit_weight: float = 0.0625
    median_commit_weight: float = 0.25
    fine_commit_weight: float = 1.0

    def setup(self):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        block_in_median = block_in // (self.ch_mult[-1] // self.ch_mult[-2])
        block_in_fine = block_in // (self.ch_mult[-1] // self.ch_mult[-3])
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
        self.head_median = GrainHead(block_in_median, self.z_channels, self.dropout, self.dtype)
        self.head_fine = GrainHead(block_in_fine, self.z_channels, self.dropout, self.dtype)
        self.router = instantiate_from_config(self.router_config)
        self._num_res = num_res

    def __call__(self, x, x_entropy=None, train: bool = False):
        assert x.shape[1] == x.shape[2] == self.resolution, x.shape
        deterministic = not train
        taps = self.down(x, deterministic=deterministic)
        h_coarse = self.head_coarse(taps["final"], deterministic=deterministic)
        h_median = self.head_median(taps[self._num_res - 2], deterministic=deterministic)
        h_fine = self.head_fine(taps[self._num_res - 3], deterministic=deterministic)

        gate = self.router(
            h_fine=h_fine, h_median=h_median, h_coarse=h_coarse, entropy=x_entropy
        )
        if train:
            gate = gumbel_softmax_st(self.make_rng("gumbel"), gate.astype(jnp.float32))
        indices = jnp.argmax(gate, axis=-1)  # (B, Hc, Wc); 0 coarse, 1 median, 2 fine

        h_coarse_up = repeat2d(h_coarse, 4)
        h_median_up = repeat2d(h_median, 2)
        indices_rep = repeat2d(indices[..., None], 4)

        h_triple = jnp.where(indices_rep == 0, h_coarse_up, h_median_up)
        h_triple = jnp.where(indices_rep == 2, h_fine, h_triple)

        if train:
            gate_grad = jnp.max(gate, axis=-1, keepdims=True)
            h_triple = h_triple * repeat2d(gate_grad, 4)

        codebook_mask = jnp.where(
            indices_rep == 0,
            self.coarse_commit_weight,
            jnp.where(indices_rep == 1, self.median_commit_weight, self.fine_commit_weight),
        ).astype(h_triple.dtype)

        return {
            "h_triple": h_triple,
            "indices": indices,
            "codebook_mask": codebook_mask,
            "gate": gate,
        }

"""Dual-grain code packing/unpacking with static padded shapes.

Reference semantics (`modules/dynamic_modules/permuter.py:50-135`,
`DualGrainSeperatePermuter`): a dense (B, 32, 32) code map plus a (B, 16, 16)
grain map become six sequences — coarse content/position/segment and fine
content/position/segment. Coarse selects the top-left code of each 2x2 region
where grain==0 (raster order) then `<eos>`, padded with `<pad>`; fine selects
all four codes of grain==1 regions in ``row-first`` (raster at 32x32) or
``region-first`` (2x2 blocks per region) order. `forward_back` inverts:
scatter coarse codes onto the 16^2 grid, upsample 2x2, overwrite with fine
codes at fine positions.

TPU-first rebuild: the reference loops over the batch in Python and pads to
the *batch* max (`permuter.py:61-99`); here packing is a vmapped stable-argsort
gather with masks, padded to *static* maxima (coarse 16^2+1, fine 32^2+1 incl.
EOS) so everything jit-compiles with fixed shapes. ``forward_back`` is a
vmapped scatter (invalid positions >= grid size are dropped via an overflow
row). Note the reference pads per batch, so its transformer attends to a
batch-dependent number of pad tokens; with static padding the pad count is
fixed (batch-invariant) — see StackGPT's ``mask_pad_attention`` for the
related option.

The class name fixes the reference's "Seperate" typo; the registry maps the
original target string here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pack_masked(values, positions, mask, max_len, eos_code, pad_code):
    """Select values[mask] in ascending `positions` order, append EOS, pad.

    values/positions/mask: (N,) arrays; returns (max_len,) int32 where
    max_len >= N + 1.
    """
    n = values.shape[0]
    key = jnp.where(mask, positions, n + positions)  # selected first, stable
    order = jnp.argsort(key)
    sel_values = jnp.take(values, order)
    count = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.arange(max_len, dtype=jnp.int32)
    gathered = jnp.take(sel_values, jnp.minimum(idx, n - 1))
    seq = jnp.where(idx < count, gathered, jnp.where(idx == count, eos_code, pad_code))
    return seq.astype(jnp.int32)


class DualGrainSeparatePermuter:
    def __init__(
        self,
        coarse_hw: int = 16,
        fine_hw: int = 32,
        content_pad_code: int = 1024,
        content_eos_code: int = 1025,
        coarse_position_pad_code: int = 256,
        coarse_position_eos_code: int = 257,
        fine_position_pad_code: int = 1024,
        fine_position_eos_code: int = 1025,
        fine_position_order: str = "region-first",
        coarse_max_len: int | None = None,
        fine_max_len: int | None = None,
    ):
        assert fine_position_order in ("row-first", "region-first")
        self.hw1 = coarse_hw
        self.hw2 = fine_hw // coarse_hw
        self.fine_hw = fine_hw
        self.hw2_square = self.hw2 * self.hw2
        self.content_pad_code = content_pad_code
        self.content_eos_code = content_eos_code
        self.coarse_position_pad_code = coarse_position_pad_code
        self.coarse_position_eos_code = coarse_position_eos_code
        self.fine_position_pad_code = fine_position_pad_code
        self.fine_position_eos_code = fine_position_eos_code
        self.fine_position_order = fine_position_order
        # static sequence capacities (incl. EOS)
        self.coarse_max_len = coarse_max_len or coarse_hw * coarse_hw + 1
        self.fine_max_len = fine_max_len or fine_hw * fine_hw + 1

        # fine position vocabulary laid out per ordering mode
        pos_fine = np.arange(fine_hw * fine_hw, dtype=np.int32).reshape(fine_hw, fine_hw)
        if fine_position_order == "region-first":
            # (h1 h2, w1 w2) -> (h1, w1, h2*w2)
            pos_fine = (
                pos_fine.reshape(self.hw1, self.hw2, self.hw1, self.hw2)
                .transpose(0, 2, 1, 3)
                .reshape(self.hw1, self.hw1, self.hw2_square)
            )
        self.position_sequence_fine = jnp.asarray(pos_fine)
        self.position_sequence_coarse = jnp.arange(self.hw1 * self.hw1, dtype=jnp.int32)

    # ------------------------------------------------------------------ pack
    def __call__(self, indices, grain_indices):
        return self.forward(indices, grain_indices)

    def forward(self, indices, grain_indices):
        """indices: (B, fine_hw, fine_hw) int; grain_indices: (B, hw1, hw1)
        with 0 = coarse (1 code / region), 1 = fine (4 codes / region).

        Returns a dict of six (B, L) int32 arrays with static L."""
        hw1, hw2, fine_hw = self.hw1, self.hw2, self.fine_hw

        # (B, hw1, hw1, hw2*hw2) region view; [..., 0] is the coarse code
        region_codes = (
            indices.reshape(-1, hw1, hw2, hw1, hw2)
            .transpose(0, 1, 3, 2, 4)
            .reshape(-1, hw1, hw1, self.hw2_square)
        )

        coarse_codes = region_codes[..., 0].reshape(-1, hw1 * hw1)
        coarse_mask = (grain_indices == 0).reshape(-1, hw1 * hw1)
        coarse_pos = jnp.broadcast_to(self.position_sequence_coarse, coarse_codes.shape)

        pack_coarse = jax.vmap(
            lambda v, p, m: _pack_masked(
                v, p, m, self.coarse_max_len, self.content_eos_code, self.content_pad_code
            )
        )
        pack_coarse_pos = jax.vmap(
            lambda v, p, m: _pack_masked(
                v,
                p,
                m,
                self.coarse_max_len,
                self.coarse_position_eos_code,
                self.coarse_position_pad_code,
            )
        )
        order_key = jnp.broadcast_to(
            jnp.arange(hw1 * hw1, dtype=jnp.int32), coarse_codes.shape
        )
        coarse_content = pack_coarse(coarse_codes, order_key, coarse_mask)
        coarse_position = pack_coarse_pos(coarse_pos, order_key, coarse_mask)

        if self.fine_position_order == "region-first":
            fine_codes = region_codes.reshape(-1, fine_hw * fine_hw)
            fine_positions = jnp.broadcast_to(
                self.position_sequence_fine.reshape(-1), fine_codes.shape
            )
            fine_mask = jnp.repeat(
                (grain_indices == 1).reshape(-1, hw1 * hw1), self.hw2_square, axis=-1
            )
        else:  # row-first: raster order at the fine resolution
            fine_codes = indices.reshape(-1, fine_hw * fine_hw)
            fine_positions = jnp.broadcast_to(
                jnp.arange(fine_hw * fine_hw, dtype=jnp.int32), fine_codes.shape
            )
            fine_grain = jnp.repeat(
                jnp.repeat(grain_indices, hw2, axis=-1), hw2, axis=-2
            )
            fine_mask = (fine_grain == 1).reshape(-1, fine_hw * fine_hw)

        order_key_f = jnp.broadcast_to(
            jnp.arange(fine_hw * fine_hw, dtype=jnp.int32), fine_codes.shape
        )
        pack_fine = jax.vmap(
            lambda v, p, m: _pack_masked(
                v, p, m, self.fine_max_len, self.content_eos_code, self.content_pad_code
            )
        )
        pack_fine_pos = jax.vmap(
            lambda v, p, m: _pack_masked(
                v,
                p,
                m,
                self.fine_max_len,
                self.fine_position_eos_code,
                self.fine_position_pad_code,
            )
        )
        fine_content = pack_fine(fine_codes, order_key_f, fine_mask)
        fine_position = pack_fine_pos(fine_positions, order_key_f, fine_mask)

        return {
            "coarse_content": coarse_content,
            "fine_content": fine_content,
            "coarse_position": coarse_position,
            "fine_position": fine_position,
            "coarse_segment": jnp.zeros_like(coarse_content),
            "fine_segment": jnp.ones_like(fine_content),
        }

    # ---------------------------------------------------------------- unpack
    def forward_back(self, coarse_content, fine_content, coarse_position, fine_position):
        """Six padded sequences -> dense (B, fine_hw, fine_hw) code map."""
        hw1, hw2, fine_hw = self.hw1, self.hw2, self.fine_hw
        n_coarse = hw1 * hw1
        n_fine = fine_hw * fine_hw

        def unpack_one(cc, fc, cp, fp):
            valid_c = cp < n_coarse
            # invalid writes routed to an overflow slot
            tgt_c = jnp.zeros((n_coarse + 1,), jnp.int32)
            tgt_c = tgt_c.at[jnp.where(valid_c, cp, n_coarse)].set(cc.astype(jnp.int32))
            coarse_grid = tgt_c[:n_coarse].reshape(hw1, hw1)
            up = jnp.repeat(jnp.repeat(coarse_grid, hw2, axis=0), hw2, axis=1)
            flat = up.reshape(n_fine)
            valid_f = fp < n_fine
            tgt = jnp.concatenate([flat, jnp.zeros((1,), jnp.int32)])
            tgt = tgt.at[jnp.where(valid_f, fp, n_fine)].set(fc.astype(jnp.int32))
            return tgt[:n_fine].reshape(fine_hw, fine_hw)

        return jax.vmap(unpack_one)(
            coarse_content, fine_content, coarse_position, fine_position
        )

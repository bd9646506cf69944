"""Fixed-length sequence orderings for the legacy transformers.

Reference: `modules/transformer/permuter.py:6-231` — Identity, Subsample
(hierarchical 2x2 subsampling order), ZCurve (Morton), SpiralOut/SpiralIn,
Random (fixed random order), AlternateParsing (boustrophedon). Each permuter
maps a raster (B, H*W) code sequence into its order (`forward`) and back
(`reverse=True`).

Orders are precomputed with numpy at construction; apply/reverse are gathers.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class _OrderPermuter:
    """Base: subclasses provide a permutation `order` over H*W raster indices
    (sequence[i] = raster[order[i]])."""

    def __init__(self, order: np.ndarray):
        self.order = jnp.asarray(order.astype(np.int32))
        inverse = np.empty_like(order)
        inverse[order] = np.arange(len(order))
        self.inverse = jnp.asarray(inverse.astype(np.int32))

    def __call__(self, x, reverse: bool = False):
        return self.forward(x, reverse)

    def forward(self, x, reverse: bool = False):
        idx = self.inverse if reverse else self.order
        return jnp.take(x, idx, axis=1)


class Identity(_OrderPermuter):
    def __init__(self, H=None, W=None, **_):
        pass  # no order table needed

    def forward(self, x, reverse: bool = False):
        return x  # raster order is the identity


class AlternateParsing(_OrderPermuter):
    """Boustrophedon: even rows left->right, odd rows right->left."""

    def __init__(self, H=32, W=32, **_):
        grid = np.arange(H * W).reshape(H, W)
        grid[1::2] = grid[1::2, ::-1]
        super().__init__(grid.reshape(-1))


class ZCurve(_OrderPermuter):
    """Morton / Z-order (reference `permuter.py:47-79`)."""

    def __init__(self, H=32, W=32, **_):
        def mortonify(i, j):
            m = 0
            for bit in range(16):
                m |= ((i >> bit) & 1) << (2 * bit + 1)
                m |= ((j >> bit) & 1) << (2 * bit)
            return m

        keys = np.array([mortonify(i, j) for i in range(H) for j in range(W)])
        super().__init__(np.argsort(keys))


class Subsample(_OrderPermuter):
    """Hierarchical 2x2 subsample order (reference `permuter.py:21-45`):
    level-0 = every 2^k-th pixel, then refine."""

    def __init__(self, H=32, W=32, **_):
        indices = np.arange(H * W).reshape(H, W)
        order = []
        seen = np.zeros((H, W), bool)
        size = min(H, W)
        levels = []
        step = size
        while step >= 1:
            levels.append(step)
            step //= 2
        for step in levels:
            for i in range(0, H, step):
                for j in range(0, W, step):
                    if not seen[i, j]:
                        order.append(indices[i, j])
                        seen[i, j] = True
        super().__init__(np.array(order))


def _spiral_order(H, W, out: bool):
    """Spiral from center outwards (out=True) or edges inwards."""
    grid = np.arange(H * W).reshape(H, W)
    coords = []
    top, bottom, left, right = 0, H - 1, 0, W - 1
    while top <= bottom and left <= right:
        for j in range(left, right + 1):
            coords.append((top, j))
        for i in range(top + 1, bottom + 1):
            coords.append((i, right))
        if top < bottom:
            for j in range(right - 1, left - 1, -1):
                coords.append((bottom, j))
        if left < right:
            for i in range(bottom - 1, top, -1):
                coords.append((i, left))
        top += 1
        bottom -= 1
        left += 1
        right -= 1
    order = np.array([grid[i, j] for i, j in coords])
    if out:
        order = order[::-1].copy()  # center-out
    return order


class SpiralOut(_OrderPermuter):
    def __init__(self, H=32, W=32, **_):
        super().__init__(_spiral_order(H, W, out=True))


class SpiralIn(_OrderPermuter):
    def __init__(self, H=32, W=32, **_):
        super().__init__(_spiral_order(H, W, out=False))


class Random(_OrderPermuter):
    """Fixed random order (reference seeds a buffer at init)."""

    def __init__(self, H=32, W=32, seed=1, **_):
        rng = np.random.default_rng(seed)
        super().__init__(rng.permutation(H * W))

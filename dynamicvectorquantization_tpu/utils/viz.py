"""Grain-map visualization overlays.

Reference: `modules/dynamic_modules/utils.py:41-161`
(`draw_dual_grain_256res_color`, `draw_triple_grain_256res`) — blend a
per-grain color over each region of the input image plus grid lines so
`log_images` shows where the router chose fine vs coarse coding.
"""
from __future__ import annotations

import numpy as np

# grain index -> RGB tint in [-1, 1] space (coarse=blue, median=green, fine=red)
_PALETTE = np.array(
    [[-0.5, -0.5, 1.0], [-0.5, 1.0, -0.5], [1.0, -0.5, -0.5], [1.0, 1.0, -0.5]],
    np.float32,
)


def draw_grain_map_color(images, indices, scaler: float = 0.7):
    """images: (B, H, W, 3) in [-1, 1]; indices: (B, h, w) int (or float in
    [0, 1] for entropy maps). Returns blended (B, H, W, 3)."""
    images = np.asarray(images, np.float32)
    indices = np.asarray(indices)
    b, h, w, _ = images.shape
    gh, gw = indices.shape[1], indices.shape[2]
    fy, fx = h // gh, w // gw

    if np.issubdtype(indices.dtype, np.floating):
        # continuous map (e.g. normalized entropy): blue -> red ramp
        t = np.clip(indices, 0.0, 1.0)[..., None]
        color = t * _PALETTE[2] + (1 - t) * _PALETTE[0]
    else:
        color = _PALETTE[np.clip(indices, 0, len(_PALETTE) - 1)]
    color_up = np.repeat(np.repeat(color, fy, axis=1), fx, axis=2)

    out = images * scaler + color_up * (1.0 - scaler)
    # grid lines at the coarse region boundaries
    out[:, ::fy, :, :] = -1.0
    out[:, :, ::fx, :] = -1.0
    return np.clip(out, -1.0, 1.0)


def draw_dual_grain_256res_color(images, indices, scaler=0.7):
    return draw_grain_map_color(images, indices, scaler)


def draw_triple_grain_256res_color(images, indices, scaler=0.7):
    return draw_grain_map_color(images, indices, scaler)

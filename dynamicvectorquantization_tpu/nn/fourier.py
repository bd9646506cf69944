"""Fourier ("LFF") and learned 2D position embeddings for the DQ-VAE decoder.

Reference: `modules/dynamic_modules/fourier_embedding.py` (coord grid ->
1x1 conv -> sin) and `modules/dynamic_modules/DecoderPositional.py:13-39`
(learned row/col embedding sum). NHWC layout.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .init import trunc_normal_init, uniform_init


def coord_grid(h: int, w: int, integer_values: bool = False) -> jnp.ndarray:
    """(1, H, W, 2) coordinate grid; channels = (x, y), each linspace(-1, 1).

    Matches the reference's `convert_to_coord_format` (x varies along width,
    y along height)."""
    if integer_values:
        xs = np.arange(w, dtype=np.float32)
        ys = np.arange(h, dtype=np.float32)
    else:
        xs = np.linspace(-1.0, 1.0, w, dtype=np.float32)
        ys = np.linspace(-1.0, 1.0, h, dtype=np.float32)
    x_chan = np.broadcast_to(xs[None, :], (h, w))
    y_chan = np.broadcast_to(ys[:, None], (h, w))
    return jnp.asarray(np.stack([x_chan, y_chan], axis=-1)[None])


class FourierPositionEmbedding(nn.Module):
    """x + sin(Conv1x1(coords)) — "learned Fourier features"."""

    coord_size: int
    hidden_size: int
    integer_values: bool = False

    @nn.compact
    def __call__(self, x):
        coords = coord_grid(self.coord_size, self.coord_size, self.integer_values)
        # reference ConLinear is_first init: uniform(-sqrt(9/ch_in), sqrt(9/ch_in))
        lim = float(np.sqrt(9.0 / 2.0))
        feat = nn.Conv(
            self.hidden_size,
            (1, 1),
            kernel_init=uniform_init(-lim, lim),
            name="ffm",
        )(coords)
        return x + jnp.sin(feat)


class PositionEmbedding2DLearned(nn.Module):
    """x + row_embed(j)[:, None] + col_embed(i)[None, :] (trunc-normal init)."""

    n_row: int
    feats_dim: int
    n_col: int | None = None

    @nn.compact
    def __call__(self, x):
        n_col = self.n_col if self.n_col is not None else self.n_row
        h, w = x.shape[1], x.shape[2]
        row = nn.Embed(
            self.n_row, self.feats_dim, embedding_init=trunc_normal_init(), name="row_embed"
        )(jnp.arange(h))
        col = nn.Embed(
            n_col, self.feats_dim, embedding_init=trunc_normal_init(), name="col_embed"
        )(jnp.arange(w))
        pos = row[:, None, :] + col[None, :, :]  # (H, W, C)
        return x + pos[None]

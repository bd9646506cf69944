"""Fused Pallas TPU kernel for nearest-codebook vector quantization.

One VMEM pass per tile of input rows computes: the L2 distance matrix against
the whole codebook (MXU matmul) and the argmin code index. The INFERENCE
variant stops there — the quantized vectors are a cheap XLA row gather
(jnp.take) outside the kernel (r04: the in-kernel one-hot @ codebook matmul
at Precision.HIGHEST doubled kernel FLOPs for an exact row selection). The
TRAINING variant keeps the one-hot matmuls: it needs them anyway for the
per-cluster EMA statistics (one-hot.T @ x and cluster counts) accumulated
across the sequential TPU grid.

This replaces the reference's three-step torch path (`torch.addmm` distance +
`argmin` + embedding lookup, `modules/vector_quantization/quantize2_mask.py:
30-55,117-132`) with a single kernel that never materializes the (N, K)
distance matrix in HBM.

Distance note: argmin_k(|x|^2 + |c_k|^2 - 2 x·c_k) == argmin_k(|c_k|^2 - 2 x·c_k),
so the kernel skips the |x|^2 term entirely.

The pure-XLA fallback (`nearest_codes_xla`) is numerically identical and used
on non-TPU backends (tests run it on CPU) and as a cross-check for the kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows of x processed per grid step. 256 rows measured fastest on v5e for
# both variants (512 fits VMEM for inference but benched ~12% slower — worse
# grid pipelining; the TRAIN variant's (K, D) EMA accumulators overflow the
# ~16MB scoped VMEM limit at 512 anyway).
_TILE_N_INFER = 256
_TILE_N_TRAIN = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vq_kernel_infer(x_ref, cb_ref, cb_norm_ref, idx_ref):
    # idx only: the quantized vectors are a row gather the CALLER does with
    # jnp.take — an HBM-bandwidth op (~0.1 ms for the headline geometry) vs
    # the onehot @ codebook MXU matmul this kernel used through r03, which
    # at Precision.HIGHEST (6-pass bf16) doubled the kernel's FLOPs for an
    # exact row-selection. Also exactly preserves f32 codebook values, which
    # the HIGHEST matmul did too but a cheaper matmul would not.
    x = x_ref[:]  # (TN, D)
    scores = cb_norm_ref[:] - 2.0 * jnp.dot(
        x, cb_ref[:].T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TN, K)
    idx_ref[:] = jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None]


def _vq_kernel_train(x_ref, cb_ref, cb_norm_ref, idx_ref, xq_ref, esum_ref, csize_ref):
    x = x_ref[:]
    scores = cb_norm_ref[:] - 2.0 * jnp.dot(
        x, cb_ref[:].T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    idx = jnp.argmin(scores, axis=1).astype(jnp.int32)
    idx_ref[:] = idx[:, None]
    k = scores.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], k), 1)
    onehot = (col == idx[:, None]).astype(jnp.float32)
    xq_ref[:] = jnp.dot(
        onehot, cb_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # Accumulate EMA statistics across the (sequential) grid.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        esum_ref[:] = jnp.zeros_like(esum_ref)
        csize_ref[:] = jnp.zeros_like(csize_ref)

    esum_ref[:] += jnp.dot(
        onehot.T, x, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    csize_ref[:] += jnp.sum(onehot, axis=0)[:, None]


def _pallas_nearest(x: jnp.ndarray, codebook: jnp.ndarray, with_stats: bool):
    n, d = x.shape
    k = codebook.shape[0]
    tile = _TILE_N_TRAIN if with_stats else _TILE_N_INFER
    n_pad = _round_up(max(n, 8), tile)
    if n_pad != n:
        # Padding rows are zero vectors: they contribute nothing to embed_sum
        # (onehot.T @ 0 == 0) and a known constant to cluster_size (they all
        # land on argmin_k |c_k|^2), which is subtracted below.
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    grid = n_pad // tile

    cb_norm = jnp.sum(codebook * codebook, axis=1)[None, :]  # (1, K)

    out_shapes = [
        jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    if with_stats:
        out_shapes.insert(1, jax.ShapeDtypeStruct((n_pad, d), jnp.float32))
        out_specs.insert(
            1, pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        out_shapes += [
            jax.ShapeDtypeStruct((k, d), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    kernel = _vq_kernel_train if with_stats else _vq_kernel_infer
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k * d * (2 if with_stats else 1),
            bytes_accessed=n_pad * d * 8 + k * d * 4,
            transcendentals=0,
        ),
    )(x, codebook, cb_norm)

    idx = outs[0][:n, 0]
    if not with_stats:
        return idx, jnp.take(codebook, idx, axis=0)
    xq = outs[1][:n]
    cluster_size = outs[3][:, 0]
    if n_pad != n:
        pad_idx = jnp.argmin(jnp.sum(codebook * codebook, axis=1))
        cluster_size = cluster_size.at[pad_idx].add(-(n_pad - n))
    return idx, xq, outs[2], cluster_size


def nearest_codes_xla(x: jnp.ndarray, codebook: jnp.ndarray):
    """Pure-XLA nearest-code path (CPU tests, non-TPU backends, cross-check).

    Precision.HIGHEST matters on TPU: the default bf16 MXU matmul misranks
    ~1% of nearest-code assignments (measured 8/1024 vs float64 exact); the
    Pallas kernel and this fallback both compute distances in f32."""
    scores = jnp.sum(codebook * codebook, axis=1)[None, :] - 2.0 * jnp.dot(
        x, codebook.T, precision=jax.lax.Precision.HIGHEST
    )
    idx = jnp.argmin(scores, axis=1).astype(jnp.int32)
    return idx, jnp.take(codebook, idx, axis=0)


# The kernel outputs are piecewise-constant in (x, codebook): argmin indices,
# gathered codes, and count statistics all have zero gradient almost
# everywhere (the straight-through estimator lives in the CALLER, ops/vq.py).
# Declaring that with custom_vjp also keeps jax.grad / jax.checkpoint from
# trying to trace the Pallas kernel under AD transforms (which fails).


@jax.custom_vjp
def _pallas_nearest_infer(x, codebook):
    return _pallas_nearest(x, codebook, with_stats=False)


def _pallas_nearest_infer_fwd(x, codebook):
    return _pallas_nearest_infer(x, codebook), (x, codebook)


def _pallas_nearest_infer_bwd(res, _g):
    x, codebook = res
    return jnp.zeros_like(x), jnp.zeros_like(codebook)


_pallas_nearest_infer.defvjp(_pallas_nearest_infer_fwd, _pallas_nearest_infer_bwd)


@jax.custom_vjp
def _pallas_nearest_train(x, codebook):
    return _pallas_nearest(x, codebook, with_stats=True)


def _pallas_nearest_train_fwd(x, codebook):
    return _pallas_nearest_train(x, codebook), (x, codebook)


def _pallas_nearest_train_bwd(res, _g):
    x, codebook = res
    return jnp.zeros_like(x), jnp.zeros_like(codebook)


_pallas_nearest_train.defvjp(_pallas_nearest_train_fwd, _pallas_nearest_train_bwd)


def nearest_codes(x: jnp.ndarray, codebook: jnp.ndarray, use_pallas: bool | None = None):
    """Nearest codebook entry per row of x.

    Args:
      x: (N, D) float32.
      codebook: (K, D) float32 (no padding row).

    Returns:
      (idx (N,) int32, quantized (N, D) float32)
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _pallas_nearest_infer(
            x.astype(jnp.float32), codebook.astype(jnp.float32)
        )
    return nearest_codes_xla(x, codebook)


def nearest_codes_with_stats(
    x: jnp.ndarray, codebook: jnp.ndarray, use_pallas: bool | None = None
):
    """Nearest codes plus per-cluster (embed_sum, cluster_size) statistics."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _pallas_nearest_train(
            x.astype(jnp.float32), codebook.astype(jnp.float32)
        )
    idx, xq = nearest_codes_xla(x, codebook)
    k = codebook.shape[0]
    embed_sum = jax.ops.segment_sum(x, idx, num_segments=k)
    cluster_size = jnp.zeros((k,), jnp.float32).at[idx].add(1.0)
    return idx, xq, embed_sum, cluster_size

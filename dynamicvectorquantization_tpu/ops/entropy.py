"""Differentiable per-patch image entropy (Gaussian-KDE histogram).

Semantics match the reference's in-model entropy
(`models/stage1_dynamic/dqvae_dual_entropy.py:13-63`): grayscale via
Rec.601 weights, non-overlapping ``patch_size`` patches, a 32-bin Gaussian
kernel-density histogram with sigma=0.01, and Shannon entropy per patch.

The reference materializes a (B*P, pixels, bins) residual tensor; on TPU
the default path (`_patch_entropy_xla`) `lax.scan`s over the 32 bins so the
transient stays (B*P, pixels) — HBM traffic is linear in the image size and
XLA fuses the exp/mean chain on the VPU.

There is also a fully fused Pallas kernel (`_entropy_kernel`): one grid
step reads one image's grayscale plane into VMEM once and writes only the
(gh, gw) entropy map. Standalone it beats the XLA path (2.17 vs 2.51 ms at
batch 64x256^2 on v5e, r04 measurement), but it is OFF by default inside
the encode graph: the entropy branch is data-independent of the conv tower,
and XLA overlaps its VPU work with the MXU convs — the opaque pallas_call
serializes that overlap and the full encode headline measured 1008 vs 1041
img/s (r04 A/B). Use `use_pallas=True` for standalone/offline callers
(e.g. threshold precompute over a dataset) where there is nothing to
overlap with.

Bin-range convention: the in-model reference uses ``linspace(-1, 1, 32)``
(images live in [-1, 1]); the reference's offline threshold precompute
(`scripts/tools/calculate_entropy_thresholds.py:74`) used ``linspace(0, 1, 32)``.
We default to the in-model convention and expose ``bin_range`` so threshold
tables can be regenerated consistently (see scripts/tools).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# The reference uses eps=1e-40, a float32 *subnormal*: XLA flushes it to zero
# (log(0) * 0 -> NaN). 1e-20 is the smallest-footprint normal guard; the
# entropy difference vs the reference is O(1e-17) nats, far below float32
# resolution of the result.
_EPS = 1e-20


_GRAY = (0.2989, 0.5870, 0.1140)  # Rec.601, matches the reference


def patch_entropy(
    images: jnp.ndarray,
    patch_size: int = 16,
    num_bins: int = 32,
    sigma: float = 0.01,
    bin_range: tuple[float, float] = (-1.0, 1.0),
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Per-patch KDE-histogram entropy.

    Args:
      images: (B, H, W, 3) float array in [-1, 1] (NHWC).
      patch_size: side of the square non-overlapping patches.
      use_pallas: opt into the fused TPU kernel (standalone-faster; see
        module docstring for why the in-graph default is the XLA path).

    Returns:
      (B, H // patch_size, W // patch_size) float32 entropy map.
    """
    b, h, w, c = images.shape
    assert c == 3, f"expected RGB NHWC input, got {images.shape}"
    assert h % patch_size == 0 and w % patch_size == 0

    if use_pallas is None:
        use_pallas = (
            os.environ.get("DQVQ_PALLAS_ENTROPY") == "1"
            and jax.default_backend() == "tpu"
        )
    elif use_pallas and not (w % 128 == 0 and h % 8 == 0):
        # an EXPLICIT use_pallas=True must not silently run the XLA path —
        # offline callers would believe they benchmarked the kernel
        raise ValueError(
            f"patch_entropy use_pallas=True needs W % 128 == 0 and "
            f"H % 8 == 0 (TPU lane/sublane tiling); got H={h}, W={w}. "
            "Pass use_pallas=None to auto-select."
        )
    use_pallas = use_pallas and w % 128 == 0 and h % 8 == 0
    gray = (
        _GRAY[0] * images[..., 0]
        + _GRAY[1] * images[..., 1]
        + _GRAY[2] * images[..., 2]
    ).astype(jnp.float32)
    if use_pallas:
        return _patch_entropy_pallas(
            gray, patch_size, num_bins, sigma, bin_range
        )
    return _patch_entropy_xla(gray, patch_size, num_bins, sigma, bin_range)


def _patch_entropy_xla(gray, patch_size, num_bins, sigma, bin_range):
    b, h, w = gray.shape
    gh, gw = h // patch_size, w // patch_size
    # (B, gh, p, gw, p) -> (B, gh, gw, p*p)
    patches = gray.reshape(b, gh, patch_size, gw, patch_size)
    patches = patches.transpose(0, 1, 3, 2, 4).reshape(b, gh, gw, patch_size * patch_size)

    bins = jnp.linspace(bin_range[0], bin_range[1], num_bins, dtype=jnp.float32)
    inv_sigma = 1.0 / sigma

    def bin_pdf(_, bin_center):
        r = (patches - bin_center) * inv_sigma
        return None, jnp.mean(jnp.exp(-0.5 * r * r), axis=-1)

    _, pdf = jax.lax.scan(bin_pdf, None, bins)  # (num_bins, B, gh, gw)
    pdf = jnp.moveaxis(pdf, 0, -1)  # (B, gh, gw, num_bins)
    pdf = pdf / (jnp.sum(pdf, axis=-1, keepdims=True) + _EPS) + _EPS
    return -jnp.sum(pdf * jnp.log(pdf), axis=-1)


def _entropy_kernel(gray_ref, out_ref, *, p, num_bins, lo, delta, inv_sigma):
    """One grid step = one image: (H, W) grayscale in VMEM -> (gh, gw) map.

    Per-patch pixel sums are two tiny MXU matmuls against block-diagonal
    0/1 selectors (built from iota, constant-folded) — this sidesteps the
    (rows, patch, cols) reshape that would otherwise split the lane
    dimension. The bin loop is fully unrolled (static Python loop over
    `num_bins`); each iteration's (H, W) exp transient is ~256 KB of VMEM
    at 256^2, freed per iteration by Mosaic's liveness analysis.
    """
    x = gray_ref[0]  # (H, W) f32
    hh, ww = x.shape
    gh, gw = hh // p, ww // p

    gi = jax.lax.broadcasted_iota(jnp.int32, (gh, hh), 0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (gh, hh), 1) // p
    sel_rows = (gi == ri).astype(jnp.float32)  # (gh, H): sums row groups
    cj = jax.lax.broadcasted_iota(jnp.int32, (ww, gw), 0) // p
    gj = jax.lax.broadcasted_iota(jnp.int32, (ww, gw), 1)
    sel_cols = (cj == gj).astype(jnp.float32)  # (W, gw): sums col groups

    # static unroll over the bins: every op below is 2D (the safest Mosaic
    # lowering) and the (H, W) exp transient is reused bin to bin
    pdfs = []
    for j in range(num_bins):
        r = (x - (lo + delta * j)) * inv_sigma
        e = jnp.exp(-0.5 * r * r)  # (H, W)
        rowband = jnp.dot(sel_rows, e, preferred_element_type=jnp.float32)
        per_patch = jnp.dot(
            rowband, sel_cols, preferred_element_type=jnp.float32
        )  # (gh, gw)
        pdfs.append(per_patch)
    pdf = jnp.stack(pdfs, axis=0) * (1.0 / (p * p))  # (nb, gh, gw) mean
    s = jnp.sum(pdf, axis=0, keepdims=True)
    pr = pdf / (s + _EPS) + _EPS
    out_ref[0] = -jnp.sum(pr * jnp.log(pr), axis=0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _patch_entropy_pallas(gray, patch_size, num_bins, sigma, bin_range):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = gray.shape
    gh, gw = h // patch_size, w // patch_size
    lo, hi = bin_range
    delta = (hi - lo) / (num_bins - 1)

    kernel = functools.partial(
        _entropy_kernel,
        p=patch_size,
        num_bins=num_bins,
        lo=float(lo),
        delta=float(delta),
        inv_sigma=1.0 / sigma,
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, gh, gw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, gh, gw), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_bins * h * w,
            bytes_accessed=b * h * w * 4 + b * gh * gw * 4,
            transcendentals=b * num_bins * h * w,
        ),
    )(gray)

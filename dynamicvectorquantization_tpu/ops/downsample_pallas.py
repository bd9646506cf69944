"""Fused Pallas TPU kernel for the VQGAN stride-2 3x3 downsample conv.

Why this exists: XLA's native strided convolution at the encoder's
128-channel levels runs at ~16% true MXU efficiency — r05 xplane at the
headline batch-64 geometry measured `down_0_downsample/conv` at 10.1 ms/step
against a 1.57 ms FLOP floor (309 GFLOP true work; XLA itself reports ~5x
inflated FLOPs for its chosen strided algorithm). Conv-API rewrites all lose
to the HBM relayouts they introduce (measured standalone at batch 64:
native 7.65 ms, pad+VALID 7.60, space-to-depth 16.25, polyphase 17.03,
W-channel-packing 11.27 — see `nn/blocks._StridedConv3x3`).

This kernel expresses the strided conv as 9 shifted (M, C) @ (C, K) MXU
matmuls over a VMEM-resident input tile — no HBM relayout at all; the
stride-2 tap selection is an in-register strided slice:

    y[r, j, k] = sum_{du,dv<3} x[2r+du, 2j+dv, :] . w[du, dv, :, k]

Reference semantics (asymmetric zero pad (0,1),(0,1) then VALID — reference
`modules/diffusionmodules/model.py:56-75`) are handled without padding HBM:
only the LAST output row/column reads the pad, so the du=2 halo row comes
from a second BlockSpec on the same array (clamped + masked to zero on the
final row-tile) and the dv=2 tap is computed one column short and
zero-extended in registers.

The backward pass delegates to `jax.vjp` of the native XLA conv (identical
math): the kernel accelerates inference and the forward half of training;
gradient convs stay on XLA's (slow but correct) path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (memory spaces)

# Output rows per grid step. 32 keeps the double-buffered input block
# (1, 64, W, C) ~= 4.2 MB at the level-0 geometry within scoped VMEM while
# amortizing the ~1 us/grid-step sequencer overhead (QUIRKS #26: few fat
# steps) — 256 steps at batch 64 level 0.
_TH = 32


def _ds_kernel(x_ref, halo_ref, w2_ref, w3_ref, b_ref, o_ref, *, th: int,
               out_w: int):
    # Mosaic supports only unit-stride register slices, so the stride-2 tap
    # selection is expressed as parity reshapes + unit slices:
    #   * row parity: reshape the OUTER dim (2th -> (th, 2)) — free
    #     addressing — and slice the parity;
    #   * column pairing: reshape (W, C) -> (W/2, 2C), merging each column
    #     pair into the lane dim; taps dv=0,1 become ONE (M, 2C) @ (2C, K)
    #     matmul against the stacked kernel w2[du] = [w[du,0]; w[du,1]],
    #     and the dv=2 tap is the even-column half of the NEXT pair: a
    #     one-step sublane shift + a lane slice [:C], dotted with w[du,2].
    # Total: 6 MXU matmuls at exactly the conv's 9*C*K MACs/output.
    x = x_ref[0]  # (2*th, W, C)
    halo = halo_ref[0, 0]  # (W, C) = input row 2*th*(i+1) (clamped on last)
    last = pl.program_id(1) == pl.num_programs(1) - 1
    halo = jnp.where(last, jnp.zeros_like(halo), halo)  # pad row is zeros

    w = x.shape[1]
    c = x.shape[-1]
    k = w2_ref.shape[-1]
    # ONE sublane->lane relayout for the whole block (the expensive shuffle;
    # doing it per-du measured 7.07 ms/call vs native 7.25 — relayout-bound)
    xm = x.reshape(2 * th, out_w, 2 * c)  # col pairs merged into lanes
    hm = halo.reshape(out_w, 2 * c)
    # dv=2 tap source: even column of pair j+1 — shift the sublane dim once
    xs = jnp.concatenate(
        [xm[:, 1:, :c], jnp.zeros((2 * th, 1, c), xm.dtype)], axis=1
    )
    hs = jnp.concatenate(
        [hm[1:, :c], jnp.zeros((1, c), hm.dtype)], axis=0
    )

    def rowset(a, h_row):
        ap = a.reshape(th, 2, a.shape[1], a.shape[2])
        even, odd = ap[:, 0], ap[:, 1]
        even2 = jnp.concatenate([even[1:], h_row[None]], axis=0)
        return even, odd, even2

    rows2 = rowset(xm, hm)
    rows3 = rowset(xs, hs)

    m = th * out_w
    acc = jnp.zeros((m, k), jnp.float32)
    for du in range(3):
        acc = acc + jax.lax.dot_general(
            rows2[du].reshape(m, 2 * c), w2_ref[du], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + jax.lax.dot_general(
            rows3[du].reshape(m, c), w3_ref[du], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc + b_ref[0][None, :]
    o_ref[0] = acc.reshape(th, out_w, k).astype(o_ref.dtype)


def _downsample_pallas(x, kernel, bias):
    b, h, w, c = x.shape
    k = kernel.shape[-1]
    th = min(_TH, h // 2)
    assert h % (2 * th) == 0, (h, th)
    grid = (b, h // (2 * th))

    kb = kernel.astype(x.dtype)
    # stacked kernels for the lane-merged formulation (see _ds_kernel):
    # w2[du] = [w[du,0]; w[du,1]] over 2C input lanes; w3[du] = w[du,2]
    w2 = jnp.concatenate([kb[:, 0], kb[:, 1]], axis=1)  # (3, 2C, K)
    w3 = kb[:, 2]  # (3, C, K)

    out = pl.pallas_call(
        functools.partial(_ds_kernel, th=th, out_w=w // 2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * th, w, c), lambda bb, i: (bb, i, 0, 0)),
            # halo: 2-row blocks over the same array; block row-index
            # (i+1)*th covers input rows [2*th*(i+1), ...+2) — row 0 is the
            # du=2 tap's last needed row; explicitly clamped in-bounds on
            # the final tile (whose halo is masked to the zero pad row
            # in-kernel anyway).
            pl.BlockSpec(
                (1, 2, w, c),
                lambda bb, i: (
                    bb, jnp.minimum((i + 1) * th, h // 2 - 1), 0, 0
                ),
            ),
            pl.BlockSpec((3, 2 * c, k), lambda bb, i: (0, 0, 0)),
            pl.BlockSpec((3, c, k), lambda bb, i: (0, 0, 0)),
            pl.BlockSpec((1, k), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w // 2, k), lambda bb, i: (bb, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, k), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h // 2) * (w // 2) * 9 * c * k,
            bytes_accessed=x.size * x.dtype.itemsize
            + b * (h // 2) * (w // 2) * k * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, x, w2, w3, bias.astype(x.dtype)[None])
    return out


def _native_strided_conv(x, kernel, bias):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (2, 2), ((0, 1), (0, 1)),
        dimension_numbers=dn,
    )
    return y + bias.astype(x.dtype)


@jax.custom_vjp
def strided_conv3x3_down(x, kernel, bias):
    """3x3 stride-2 conv, reference pad (0,1),(0,1); Pallas on TPU for the
    geometries where XLA's strided conv is MXU-starved, else native XLA."""
    return _strided_impl(x, kernel, bias)


def _use_kernel(x):
    import os

    # default OFF: the kernel only ever reached parity with XLA's strided
    # conv (6.63 vs 6.84 ms/call at the level-0 batch-64 geometry) — every
    # formulation of the stride-2 column selection (strided register slices
    # are illegal in Mosaic; parity reshapes, lane-merged pairs, single
    # up-front relayout) is bound by ~14 MB/step of VPU shuffle traffic, not
    # the 0.6 GFLOP of matmul. See QUIRKS #29. DQVQ_DS_KERNEL=1 enables.
    if os.environ.get("DQVQ_DS_KERNEL", "0") != "1":
        return False
    b, h, w, c = x.shape
    return (
        jax.default_backend() == "tpu"
        # bf16 compute path only: on the f32 parity path XLA's conv keeps
        # its own (higher) f32 accumulation passes; the kernel's dot would
        # change precision semantics there
        and x.dtype == jnp.bfloat16
        and c % 128 == 0
        and w % 2 == 0
        and h % 2 == 0
        and (h // 2) % min(_TH, h // 2) == 0
        and h >= 32
    )


def _strided_impl(x, kernel, bias):
    if _use_kernel(x):
        return _downsample_pallas(x, kernel, bias)
    return _native_strided_conv(x, kernel, bias)


def _fwd(x, kernel, bias):
    return _strided_impl(x, kernel, bias), (x, kernel)


def _bwd(res, g):
    # identical math to the forward; XLA derives the gradient convs
    x, kernel = res
    _, vjp = jax.vjp(
        lambda xx, ww: _native_strided_conv(xx, ww, jnp.zeros((), x.dtype)),
        x,
        kernel,
    )
    dx, dw = vjp(g)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(x.dtype)
    return dx, dw, db


strided_conv3x3_down.defvjp(_fwd, _bwd)

"""Fused LayerNorm (Pallas TPU) with a recompute-stats backward.

Motivation: the stage-2 profile (`benches/profile_stage2.py`, VERDICT r02
weak #1) attributed ~27 ms of the 191 ms device step to layernorms — 49 LN
applications per fwd+bwd (24 blocks x 2 + final) over (B=8, T~808, D=1024),
each of which XLA lowers as several reduce+broadcast passes with separate
f32 upcast materializations. This kernel does the whole normalization in ONE
read + ONE write per row block (f32 math in VMEM), and its backward
recomputes mean/rstd from x instead of storing them — dgamma/dbeta
accumulate across the sequential TPU grid exactly like dk/dv in
`ops/attention_pallas.py`.

The kernel consumes the model's native (..., T, D) layout directly (grid
(prod(leading), cdiv(T, RB))) — flattening to (N, D) first costs a real HBM
copy when T is not tile-aligned (805 rows → the (8,805,1024)->(6440,1024)
reshape re-indexes across the 8-row tile padding; the r03 xplane trace
showed ~3.3 ms/step of reshape ops, most from these flattens).

Semantics match `flax.linen.LayerNorm` (reference block semantics:
`modules/dynamic_modules/stackgpt.py:17-96` pre-LN blocks): statistics in
float32 over the last axis, scale+bias, output cast back to the input dtype.

Domain: feature dim D % 128 == 0 (TPU lane width); callers fall back to
`nn.LayerNorm` otherwise or off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_RB = 256  # rows per grid step


def _valid_rows(rb, n_rows):
    """(rb, 1) mask of in-bounds rows for the current (row-blocked) grid step."""
    from jax.experimental import pallas as pl

    row = pl.program_id(1) * rb + jax.lax.broadcasted_iota(
        jnp.int32, (rb, 1), 0
    )
    return row < n_rows


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)  # (RB, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    y = xhat * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps, n_rows):
    from jax.experimental import pallas as pl

    # the last row block may read undefined pad rows; dgamma/dbeta ACCUMULATE
    # over rows, so zero invalid rows of every row-indexed operand (NaN
    # survives 0*NaN — masking after the fact is not enough)
    valid = _valid_rows(x_ref.shape[1], n_rows)
    x = jnp.where(valid, x_ref[0].astype(jnp.float32), 0.0)
    dy = jnp.where(valid, dy_ref[0].astype(jnp.float32), 0.0)
    g = g_ref[...].astype(jnp.float32)

    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd

    dyg = dy * g
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx_ref[0] = ((dyg - m1 - xhat * m2) * rstd).astype(dx_ref.dtype)

    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)  # (1, D)
    db = jnp.sum(dy, axis=0, keepdims=True)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @functools.partial(_pl_when, first)
    def _init():
        dg_ref[...] = dg
        db_ref[...] = db

    @functools.partial(_pl_when, jnp.logical_not(first))
    def _acc():
        dg_ref[...] += dg
        db_ref[...] += db


def _pl_when(cond, fn):
    from jax.experimental import pallas as pl

    return pl.when(cond)(fn)


def _specs(rb, d):
    from jax.experimental import pallas as pl

    xspec = pl.BlockSpec((1, rb, d), lambda i, j: (i, j, 0))
    gspec = pl.BlockSpec((1, d), lambda i, j: (0, 0))
    return xspec, gspec


def _as3d(x):
    """(..., T, D) -> (prod(leading), T, D) — a free reshape (leading dims
    collapse without re-tiling; only the minor two dims are tiled)."""
    d = x.shape[-1]
    t = x.shape[-2] if x.ndim >= 2 else 1
    return x.reshape(-1, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layernorm(x, gamma, beta, eps=1e-5, interpret=False):
    """LayerNorm over the last axis of x (any leading shape, D % 128 == 0).

    gamma/beta: (D,). f32 statistics, output in x.dtype; differentiable in
    x/gamma/beta (dgamma/dbeta returned in float32 like flax)."""
    y, _ = _ln_fwd(x, gamma, beta, eps, interpret)
    return y


def _ln_fwd(x, gamma, beta, eps, interpret):
    from jax.experimental import pallas as pl

    shape = x.shape
    d = shape[-1]
    x3 = _as3d(x)
    b, t = x3.shape[0], x3.shape[1]
    rb = min(_RB, t)
    xspec, gspec = _specs(rb, d)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(b, pl.cdiv(t, rb)),
        in_specs=[xspec, gspec, gspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(x3, gamma.reshape(1, d), beta.reshape(1, d))
    return y.reshape(shape), (x, gamma)


def _ln_bwd(eps, interpret, res, dy):
    from jax.experimental import pallas as pl

    x, gamma = res
    shape = x.shape
    d = shape[-1]
    x3 = _as3d(x)
    dy3 = _as3d(dy)
    b, t = x3.shape[0], x3.shape[1]
    rb = min(_RB, t)
    xspec, gspec = _specs(rb, d)
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, n_rows=t),
        grid=(b, pl.cdiv(t, rb)),
        in_specs=[xspec, gspec, xspec],
        out_specs=[xspec, gspec, gspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(x3, gamma.reshape(1, d), dy3)
    return (
        dx.reshape(shape),
        dg.reshape(-1).astype(gamma.dtype),
        db.reshape(-1).astype(gamma.dtype),
    )


fused_layernorm.defvjp(
    lambda x, gamma, beta, eps, interpret: _ln_fwd(x, gamma, beta, eps, interpret),
    _ln_bwd,
)

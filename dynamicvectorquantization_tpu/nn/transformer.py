"""GPT blocks with full-sequence training and single-token KV-cache decode.

Train path mirrors the reference's minGPT-style blocks
(`modules/dynamic_modules/stackgpt.py:17-96`): pre-LN, causal self-attention
with attn/resid dropout, GELU MLP (4x). The decode path adds what the
reference never wired up (`stackgpt.py` samplers recompute the full prefix
every token — SURVEY.md §7.1.6): a KV cache, so sampling is O(T) attention
per token instead of O(T^2) full-prefix recompute.

Cache layout: per transformer a single stacked array pair
(k, v): (num_layers, B, num_heads, T_max, head_dim) — one dynamic_update_slice
per layer per step.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .activations import gelu
from .init import normal_init
from .norm import FusedLayerNorm


class KVCache(NamedTuple):
    """Per-layer (k, v) tuples. Layers are kept as SEPARATE arrays (not one
    stacked (L, ...) array): inside a lax.while_loop each per-layer
    dynamic_update_slice then aliases its loop-carried buffer in place.
    A stacked layout forced XLA to re-materialize the full multi-hundred-MB
    cache every decode step (measured ~10ms/token at p6c18 geometry).

    int8 layout (`create_int8`): per-layer 4-tuples
    (k_i8, v_i8, k_scale, v_scale) with one absmax scale per
    (batch, head, position) — halves the decode HBM stream (ops/kv_int8.py)."""

    layers: tuple  # tuple of (k, v) pairs, each (B, H, T_max, hd)

    @classmethod
    def create(cls, num_layers, batch, num_heads, max_len, head_dim, dtype=jnp.float32):
        shape = (batch, num_heads, max_len, head_dim)
        return cls(
            tuple(
                (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
                for _ in range(num_layers)
            )
        )

    @classmethod
    def create_int8(cls, num_layers, batch, num_heads, max_len, head_dim):
        shape = (batch, num_heads, max_len, head_dim)
        sshape = (batch, num_heads, max_len)
        return cls(
            tuple(
                (
                    jnp.zeros(shape, jnp.int8),
                    jnp.zeros(shape, jnp.int8),
                    jnp.ones(sshape, jnp.float32),
                    jnp.ones(sshape, jnp.float32),
                )
                for _ in range(num_layers)
            )
        )


_DECODE_CHUNK = 256


def _chunked_decode_attention(q, k_cache, v_cache, cache_index):
    """Single-token decode attention reading only ceil((i+1)/CHUNK) cache
    chunks with an online softmax — the full-cache einsum reads the entire
    T_max cache every step, which dominates decode time (HBM-bound).
    Exact (not approximate): masked positions contribute exp(-inf) = 0.

    q: (B, H, 1, hd); caches: (B, H, T, hd) with T % _DECODE_CHUNK == 0.
    """
    b, h, t, hd = k_cache.shape
    assert t % _DECODE_CHUNK == 0, t
    scale = 1.0 / float(hd) ** 0.5
    nchunks = cache_index // _DECODE_CHUNK + 1  # traced bound is fine

    neg = jnp.finfo(jnp.float32).min

    def body(ci, carry):
        m, l, acc = carry
        start = ci * _DECODE_CHUNK
        k = jax.lax.dynamic_slice(k_cache, (0, 0, start, 0), (b, h, _DECODE_CHUNK, hd))
        v = jax.lax.dynamic_slice(v_cache, (0, 0, start, 0), (b, h, _DECODE_CHUNK, hd))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        pos = start + jnp.arange(_DECODE_CHUNK)
        s = jnp.where(pos[None, None, None, :] <= cache_index, s, neg)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v.dtype), v
        ).astype(jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((b, h, 1), neg, jnp.float32)
    l0 = jnp.zeros((b, h, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, 1, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nchunks, body, (m0, l0, acc0))
    return (acc / l[..., None]).astype(q.dtype)


class CausalSelfAttention(nn.Module):
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    # Fused Pallas attention for the full-sequence (training) path
    # (ops/attention_pallas.py) — unlike the stock flash kernel it SUPPORTS
    # attention-probability dropout (in-kernel PRNG, mask regenerated in the
    # backward), so the shipped attn_pdrop=0.1 config can use it. Falls back
    # to the naive XLA path off-TPU, with attn_bias, or beyond T=2048.
    use_flash_attention: bool = False
    # Sequence parallelism: when set (e.g. "sp") the full-sequence path runs
    # ring attention over that mesh axis (parallel/ring_attention.py) — the
    # module must then be applied inside shard_map with the sequence axis
    # sharded on it. Causality is handled globally by the ring schedule.
    sequence_parallel_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x,
        deterministic: bool = True,
        cache: Optional[tuple] = None,  # (k_layer, v_layer) (B, H, T_max, hd)
        cache_index: Optional[jnp.ndarray] = None,  # scalar int
        attn_bias: Optional[jnp.ndarray] = None,  # (B, 1, T, T) additive
    ):
        b, t, c = x.shape
        hd = c // self.n_head
        dense = lambda name: nn.Dense(c, kernel_init=normal_init(0.02), name=name)

        def heads(z):
            return z.reshape(b, t, self.n_head, hd).transpose(0, 2, 1, 3)

        qr = dense("query")(x)  # (B, T, D) — pre-head-split
        kr = dense("key")(x)
        vr = dense("value")(x)

        # the fused kernel consumes (B, T, D) directly (its grid slices
        # heads) — materializing the head transpose for a custom call costs
        # ~1.4 ms/copy at p6c18 geometry (profiled); take this branch BEFORE
        # transposing
        if (
            cache is None
            and self.sequence_parallel_axis is None
            and self.use_flash_attention
            and attn_bias is None
            and jax.default_backend() == "tpu"
            and t <= 2048  # K/V VMEM residency bound (= StackGPT block_size cap)
        ):
            from ..ops.attention_pallas import fused_causal_attention

            rate = float(self.attn_pdrop) if not deterministic else 0.0
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max
                )
            else:
                seed = 0
            y = fused_causal_attention(
                qr, kr, vr, seed, self.n_head, rate, 1.0 / float(hd) ** 0.5,
                False,
            )
            y = dense("proj")(y)
            y = nn.Dropout(self.resid_pdrop)(y, deterministic=deterministic)
            return y, None

        q = heads(qr)
        k = heads(kr)
        v = heads(vr)

        new_cache = None
        if self.sequence_parallel_axis is not None and cache is None:
            if attn_bias is not None:
                raise ValueError("sequence-parallel attention does not support attn_bias")
            if self.attn_pdrop > 0 and not deterministic:
                raise ValueError(
                    "sequence-parallel training requires attn_pdrop == 0 "
                    "(ring attention has no attention-probability dropout)"
                )
            from ..parallel.ring_attention import ring_attention

            y = ring_attention(q, k, v, axis_name=self.sequence_parallel_axis)
        elif cache is not None and len(cache) == 4:
            # int8 cache: (k_i8, v_i8, k_scale, v_scale) — decode-only (t == 1)
            from ..ops.kv_int8 import decode_attention_int8, quantize_kv

            assert t == 1, "int8 KV cache supports single-token decode only"
            k_c, v_c, ks_c, vs_c = cache
            kq, ks = quantize_kv(k)
            vq, vs = quantize_kv(v)
            k_c = jax.lax.dynamic_update_slice(k_c, kq, (0, 0, cache_index, 0))
            v_c = jax.lax.dynamic_update_slice(v_c, vq, (0, 0, cache_index, 0))
            ks_c = jax.lax.dynamic_update_slice(ks_c, ks, (0, 0, cache_index))
            vs_c = jax.lax.dynamic_update_slice(vs_c, vs, (0, 0, cache_index))
            new_cache = (k_c, v_c, ks_c, vs_c)
            y = decode_attention_int8(q, k_c, v_c, ks_c, vs_c, cache_index)
        elif cache is not None:
            k_cache, v_cache = cache
            # write this step's k/v at cache_index (decode: t == 1)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k, (0, 0, cache_index, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v, (0, 0, cache_index, 0)
            )
            new_cache = (k_cache, v_cache)
            t_max = k_cache.shape[2]
            if t == 1 and t_max % _DECODE_CHUNK == 0:
                y = _chunked_decode_attention(q, k_cache, v_cache, cache_index)
            else:
                att = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache) / jnp.sqrt(hd).astype(
                    x.dtype
                )
                key_pos = jnp.arange(t_max)
                valid = key_pos[None, None, None, :] <= cache_index
                att = jnp.where(valid, att, jnp.finfo(att.dtype).min)
                att = jax.nn.softmax(att, axis=-1)
                y = jnp.einsum("bhqk,bhkd->bhqd", att, v_cache)
        else:
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
            causal = jnp.tril(jnp.ones((t, t), bool))
            att = jnp.where(causal[None, None], att, jnp.finfo(att.dtype).min)
            if attn_bias is not None:
                att = att + attn_bias
            att = jax.nn.softmax(att, axis=-1)
            att = nn.Dropout(self.attn_pdrop)(att, deterministic=deterministic)
            y = jnp.einsum("bhqk,bhkd->bhqd", att, v)

        y = y.transpose(0, 2, 1, 3).reshape(b, t, c)
        y = dense("proj")(y)
        y = nn.Dropout(self.resid_pdrop)(y, deterministic=deterministic)
        return y, new_cache


class CrossAttention(nn.Module):
    """Queries from the token stream, keys/values from an external memory
    (text features for the t2i consuming variant — no reference analog: the
    reference's t2i model computes text features and drops them, see
    QUIRKS #18). Memory is short (<= 77 tokens), so plain XLA attention."""

    n_embd: int
    n_head: int
    resid_pdrop: float = 0.0

    @nn.compact
    def __call__(self, x, memory, memory_mask=None, deterministic=True):
        b, t, c = x.shape
        s = memory.shape[1]
        hd = c // self.n_head
        dense = lambda n, name: nn.Dense(n, kernel_init=normal_init(0.02), name=name)
        q = dense(c, "query")(x).reshape(b, t, self.n_head, hd).transpose(0, 2, 1, 3)
        k = dense(c, "key")(memory).reshape(b, s, self.n_head, hd).transpose(0, 2, 1, 3)
        v = dense(c, "value")(memory).reshape(b, s, self.n_head, hd).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        if memory_mask is not None:  # (B, S) 1=valid
            att = jnp.where(
                memory_mask[:, None, None, :] > 0, att, jnp.finfo(att.dtype).min
            )
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, c)
        y = dense(c, "proj")(y)
        return nn.Dropout(self.resid_pdrop)(y, deterministic=deterministic)


class Block(nn.Module):
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    use_flash_attention: bool = False
    sequence_parallel_axis: Optional[str] = None
    # opt-in cross-attention to a text memory after self-attention (t2i
    # consuming variant); params exist only when enabled, so checkpoints of
    # the default model are unaffected
    cross_attend: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        deterministic: bool = True,
        cache=None,
        cache_index=None,
        attn_bias=None,
        memory=None,
        memory_mask=None,
    ):
        attn_out, new_cache = CausalSelfAttention(
            self.n_embd,
            self.n_head,
            self.attn_pdrop,
            self.resid_pdrop,
            self.use_flash_attention,
            self.sequence_parallel_axis,
            name="attn",
        )(
            FusedLayerNorm(epsilon=1e-5, name="ln1")(x),
            deterministic=deterministic,
            cache=cache,
            cache_index=cache_index,
            attn_bias=attn_bias,
        )
        x = x + attn_out
        if self.cross_attend and memory is not None:
            x = x + CrossAttention(
                self.n_embd, self.n_head, self.resid_pdrop, name="xattn"
            )(
                FusedLayerNorm(epsilon=1e-5, name="ln_x")(x),
                memory, memory_mask, deterministic,
            )
        h = FusedLayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Dense(4 * self.n_embd, kernel_init=normal_init(0.02), name="mlp_fc")(h)
        h = gelu(h)  # dtype-gated: bf16 sigmoid-form (fuses into mlp_proj), f32 exact erf
        h = nn.Dense(self.n_embd, kernel_init=normal_init(0.02), name="mlp_proj")(h)
        h = nn.Dropout(self.resid_pdrop)(h, deterministic=deterministic)
        return x + h, new_cache


class TransformerStack(nn.Module):
    """N blocks; full-sequence or cached single-step."""

    num_layers: int
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    use_flash_attention: bool = False
    sequence_parallel_axis: Optional[str] = None
    cross_attend: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        deterministic: bool = True,
        cache: Optional[KVCache] = None,
        cache_index=None,
        attn_bias=None,
        memory=None,
        memory_mask=None,
    ):
        new_layers = []
        for i in range(self.num_layers):
            layer_cache = cache.layers[i] if cache is not None else None
            x, updated = Block(
                self.n_embd,
                self.n_head,
                self.attn_pdrop,
                self.resid_pdrop,
                self.use_flash_attention,
                self.sequence_parallel_axis,
                self.cross_attend,
                name=f"h_{i}",
            )(
                x,
                deterministic=deterministic,
                cache=layer_cache,
                cache_index=cache_index,
                attn_bias=attn_bias,
                memory=memory,
                memory_mask=memory_mask,
            )
            if updated is not None:
                new_layers.append(updated)
        new_cache = KVCache(tuple(new_layers)) if cache is not None else None
        return x, new_cache

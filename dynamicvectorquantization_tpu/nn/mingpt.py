"""minGPT (legacy fixed-length stage-2 transformer) with cached decode.

Reference: `modules/transformer/mingpt.py:125-355` — token + learned absolute
position embeddings, N blocks, LayerNorm + bias-free head; `sample_with_past`
is the reference's only KV-cache code path. Here the cache machinery is the
same `nn/transformer.py` used by StackGPT.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .init import normal_init
from .transformer import KVCache, TransformerStack


class GPT(nn.Module):
    vocab_size: int = 1024
    block_size: int = 512
    n_layer: int = 12
    n_head: int = 8
    n_embd: int = 256
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    n_unmasked: int = 0  # parity field; full-causal here
    use_flash_attention: bool = False
    # segment (text-vs-image) embedding — reference T2IGPT
    # (`modules/transformer/mingpt_t2i.py:124-166`); 0 = none
    segment_size: int = 0

    def setup(self):
        self.tok_emb = nn.Embed(
            self.vocab_size, self.n_embd, embedding_init=normal_init(0.02),
            name="tok_emb",
        )
        if self.segment_size > 0:
            self.seg_emb = nn.Embed(
                self.segment_size, self.n_embd, embedding_init=normal_init(0.02),
                name="seg_emb",
            )
        self.pos_emb = self.param(
            "pos_emb", nn.initializers.zeros, (1, self.block_size, self.n_embd)
        )
        self.drop = nn.Dropout(self.embd_pdrop)
        self.blocks = TransformerStack(
            num_layers=self.n_layer,
            n_embd=self.n_embd,
            n_head=self.n_head,
            attn_pdrop=self.attn_pdrop,
            resid_pdrop=self.resid_pdrop,
            use_flash_attention=self.use_flash_attention,
            name="blocks",
        )
        self.ln_f = nn.LayerNorm(epsilon=1e-5, name="ln_f")
        self.head = nn.Dense(
            self.vocab_size, use_bias=False, kernel_init=normal_init(0.02), name="head"
        )

    def __call__(self, idx, embeddings=None, targets=None, segment=None,
                 train: bool = False):
        """idx: (B, T) tokens; embeddings: optional prefix embeddings (B, P, D)
        prepended before the tokens (reference mingpt.py:137-160); segment:
        optional (B, T) segment ids added to the token embeddings
        (reference mingpt_t2i.py:161-166)."""
        x = self.tok_emb(idx)
        if segment is not None:
            x = x + self.seg_emb(segment)
        if embeddings is not None:
            x = jnp.concatenate([embeddings, x], axis=1)
        t = x.shape[1]
        x = x + self.pos_emb[:, :t, :]
        x = self.drop(x, deterministic=not train)
        x, _ = self.blocks(x, deterministic=not train)
        logits = self.head(self.ln_f(x))
        if targets is None:
            return logits, None
        from .stackgpt import cross_entropy_ignore

        loss = cross_entropy_ignore(logits, targets, ignore_index=-100)
        return logits, loss

    # --------------------------------------------------------------- decode
    def make_cache(self, batch: int, max_len: int):
        hd = self.n_embd // self.n_head
        from .transformer import _DECODE_CHUNK

        max_len = ((max_len + _DECODE_CHUNK - 1) // _DECODE_CHUNK) * _DECODE_CHUNK
        return KVCache.create(self.n_layer, batch, self.n_head, max_len, hd)

    def step(self, tok, cache: KVCache, index, seg=None):
        """One cached decode step; tok (B,), index scalar -> (logits, cache).
        seg: optional (B,) segment ids for the T2I variant."""
        x = self.tok_emb(tok)[:, None, :] + jax.lax.dynamic_slice_in_dim(
            self.pos_emb[0], index, 1, axis=0
        )
        if seg is not None:
            x = x + self.seg_emb(seg)[:, None, :]
        x, cache = self.blocks(x, deterministic=True, cache=cache, cache_index=index)
        logits = self.head(self.ln_f(x[:, 0]))
        return logits, cache

    def step_embedding(self, emb, cache: KVCache, index):
        """Cached step from a raw embedding (conditioning prefix)."""
        x = emb[:, None, :] + jax.lax.dynamic_slice_in_dim(
            self.pos_emb[0], index, 1, axis=0
        )
        x, cache = self.blocks(x, deterministic=True, cache=cache, cache_index=index)
        logits = self.head(self.ln_f(x[:, 0]))
        return logits, cache


def sample_with_past(
    gpt: GPT,
    variables,
    x0,
    steps: int,
    rng,
    temperature: float = 1.0,
    sample_logits: bool = True,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    use_segments: bool = False,
):
    """KV-cached AR sampling (reference `mingpt.py:324-355`): feed the prefix
    once, then one cached step per generated token. Returns (B, steps).
    use_segments: T2I variant — prefix tokens carry segment 0, generated
    tokens segment 1 (reference `text2image_transformer2.py:328-361`)."""
    from ..models.sampling import sample_from_logits

    b, p = x0.shape
    cache = gpt.apply(variables, b, p + steps, method="make_cache")
    seg0 = jnp.zeros((b,), jnp.int32) if use_segments else None
    seg1 = jnp.ones((b,), jnp.int32) if use_segments else None

    # prefill the prefix
    logits = None
    for i in range(p):
        logits, cache = gpt.apply(
            variables, x0[:, i], cache, jnp.int32(i), seg0, method="step"
        )

    out = jnp.zeros((b, steps), jnp.int32)

    def body(i, carry):
        out, cache, logits, rng = carry
        rng, sub = jax.random.split(rng)
        tok = sample_from_logits(
            sub, logits / temperature, 1.0, top_k, top_p, sample_logits
        ).astype(jnp.int32)
        out = jax.lax.dynamic_update_slice(out, tok[:, None], (0, i))
        logits, cache = gpt.apply(variables, tok, cache, p + i, seg1,
                                  method="step")
        return out, cache, logits, rng

    out, cache, logits, rng = jax.lax.fori_loop(
        0, steps, body, (out, cache, logits, rng)
    )
    return out

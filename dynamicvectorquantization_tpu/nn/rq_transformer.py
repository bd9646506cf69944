"""RQ-Transformer: spatial GPT over positions + depth GPT over residual codes.

The reference's `models/stage2/uncond_rqtransformer.py:18-206` trains an
external (non-vendored) RQ transformer with the interface
``transformer(idx=(B,H,W,D) codes, c_idx, model_aux, return_loss=True)`` and
``transformer.sample(partial_sample, model_aux, cond, ...)``; its optimizer
split special-cases `pos_emb_cond` / `pos_emb_hw` / `pos_emb_d` — the
parameter names kept here. This is the TPU-native implementation of that
contract:

  * spatial stack: causal transformer over the T = H*W position stream; the
    input at position t is the depth-summed code embedding of position t-1
    (cond tokens prefix the stream);
  * depth stack: for every position, a small causal transformer over the D
    residual codes: token 0 is the spatial context h_t, token d>=1 embeds
    code (t, d-1); one shared head predicts code (t, d).

Training is one fully-parallel pass (spatial (B, Lc+T-1) + depth folded to
(B*T, D) — both land on the MXU); sampling uses a KV-cached spatial decode
with an exact tiny depth forward per position. ``model_aux`` (the reference
passes the first-stage model for codebook embeddings) is accepted and
unused: the transformer owns its code embeddings.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .init import normal_init
from .transformer import KVCache, TransformerStack


class RQTransformer(nn.Module):
    vocab_size: int = 1024
    cond_vocab_size: int = 1
    spatial_size: int = 64  # H*W
    depth: int = 4
    cond_length: int = 1
    spatial_layer: int = 12
    depth_layer: int = 2
    n_head: int = 8
    n_embd: int = 256
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0

    def setup(self):
        self.code_emb = nn.Embed(
            self.vocab_size, self.n_embd, embedding_init=normal_init(0.02),
            name="code_emb",
        )
        self.cond_emb = nn.Embed(
            self.cond_vocab_size, self.n_embd, embedding_init=normal_init(0.02),
            name="cond_emb",
        )
        self.pos_emb_cond = self.param(
            "pos_emb_cond", nn.initializers.zeros,
            (1, self.cond_length, self.n_embd),
        )
        self.pos_emb_hw = self.param(
            "pos_emb_hw", nn.initializers.zeros,
            (1, self.spatial_size, self.n_embd),
        )
        self.pos_emb_d = self.param(
            "pos_emb_d", nn.initializers.zeros, (1, self.depth, self.n_embd)
        )
        self.drop = nn.Dropout(self.embd_pdrop)
        self.spatial_transformer = TransformerStack(
            num_layers=self.spatial_layer, n_embd=self.n_embd,
            n_head=self.n_head, attn_pdrop=self.attn_pdrop,
            resid_pdrop=self.resid_pdrop, name="spatial_transformer",
        )
        self.depth_transformer = TransformerStack(
            num_layers=self.depth_layer, n_embd=self.n_embd,
            n_head=self.n_head, attn_pdrop=self.attn_pdrop,
            resid_pdrop=self.resid_pdrop, name="depth_transformer",
        )
        self.ln_f = nn.LayerNorm(epsilon=1e-5, name="ln_f")
        self.head = nn.Dense(
            self.vocab_size, use_bias=False, kernel_init=normal_init(0.02),
            name="head",
        )

    # ------------------------------------------------------------ training
    def _position_embedding(self, codes_flat):
        """(B, T, D) codes -> depth-summed position embeddings + pos_emb_hw."""
        t = codes_flat.shape[1]
        summed = jnp.sum(self.code_emb(codes_flat), axis=2)  # (B, T, E)
        return summed + self.pos_emb_hw[:, :t]

    def _spatial_context(self, codes_flat, c_idx, train):
        b, t, _ = codes_flat.shape
        cond = self.cond_emb(c_idx) + self.pos_emb_cond[:, : c_idx.shape[1]]
        u = self._position_embedding(codes_flat[:, : t - 1])
        x = jnp.concatenate([cond, u], axis=1)
        x = self.drop(x, deterministic=not train)
        h, _ = self.spatial_transformer(x, deterministic=not train)
        # contexts for positions 0..T-1 start at the last cond token
        return h[:, c_idx.shape[1] - 1 : c_idx.shape[1] - 1 + t]

    def _depth_logits(self, h_t, codes_t, train):
        """h_t (N, E) context; codes_t (N, D) -> (N, D, vocab) logits."""
        n, d = codes_t.shape
        prev = self.code_emb(codes_t[:, : d - 1])  # (N, D-1, E)
        v = jnp.concatenate([h_t[:, None, :], prev], axis=1) + self.pos_emb_d
        out, _ = self.depth_transformer(v, deterministic=not train)
        return self.head(self.ln_f(out))

    def __call__(self, idx, c_idx=None, model_aux=None, return_loss=True,
                 train: bool = False):
        """idx: (B, H, W, D) codes; c_idx: (B, Lc) condition tokens."""
        del model_aux
        b, hh, ww, d = idx.shape
        codes = idx.reshape(b, hh * ww, d)
        if c_idx is None:
            c_idx = jnp.zeros((b, self.cond_length), jnp.int32)

        h = self._spatial_context(codes, c_idx, train)  # (B, T, E)
        t = codes.shape[1]
        logits = self._depth_logits(
            h.reshape(b * t, self.n_embd), codes.reshape(b * t, d), train
        ).reshape(b, t, d, self.vocab_size)

        if not return_loss:
            return logits
        from .stackgpt import cross_entropy_ignore

        return cross_entropy_ignore(
            logits.reshape(b, t * d, self.vocab_size),
            codes.reshape(b, t * d),
            ignore_index=-100,
        )

    # ------------------------------------------------------------ sampling
    def make_spatial_cache(self, batch):
        hd = self.n_embd // self.n_head
        from .transformer import _DECODE_CHUNK

        max_len = self.cond_length + self.spatial_size
        max_len = ((max_len + _DECODE_CHUNK - 1) // _DECODE_CHUNK) * _DECODE_CHUNK
        return KVCache.create(self.spatial_layer, batch, self.n_head, max_len, hd)

    def spatial_step(self, emb, cache, index):
        """One cached spatial step from a raw embedding (B, E)."""
        x, cache = self.spatial_transformer(
            emb[:, None, :], deterministic=True, cache=cache, cache_index=index
        )
        return x[:, 0], cache

    def embed_cond_token(self, tok, position):
        return self.cond_emb(tok) + self.pos_emb_cond[0, position]

    def embed_codes_at(self, codes_td, position):
        """(B, D) codes of one position -> spatial input embedding (B, E)."""
        return jnp.sum(self.code_emb(codes_td), axis=1) + self.pos_emb_hw[0, position]

    def depth_logits_step(self, h_t, codes_prefix, d_index):
        """Logits for depth d_index given context + codes 0..d_index-1.
        codes_prefix: (B, D) buffer whose first d_index entries are valid."""
        b = h_t.shape[0]
        prev = self.code_emb(codes_prefix[:, : self.depth - 1])
        v = jnp.concatenate([h_t[:, None, :], prev], axis=1) + self.pos_emb_d
        out, _ = self.depth_transformer(v, deterministic=True)
        logits = self.head(self.ln_f(out))  # (B, D, vocab)
        return jnp.take_along_axis(
            logits, jnp.full((b, 1, 1), d_index), axis=1
        )[:, 0]


def sample_rq(
    transformer: RQTransformer,
    variables,
    shape,  # (B, H, W, D)
    cond,  # (B, Lc) int tokens
    rng,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
):
    """KV-cached spatial decode; exact tiny depth forward per (position,
    depth). Mirrors the reference trainer's `transformer.sample` contract."""
    from ..models.sampling import sample_from_logits

    b, hh, ww, d = shape
    t_total = hh * ww
    cache = transformer.apply(variables, b, method="make_spatial_cache")

    h_t = None
    for i in range(cond.shape[1]):
        emb = transformer.apply(variables, cond[:, i], i, method="embed_cond_token")
        h_t, cache = transformer.apply(variables, emb, cache, jnp.int32(i),
                                       method="spatial_step")

    lc = cond.shape[1]
    out = jnp.zeros((b, t_total, d), jnp.int32)

    def position_body(t, carry):
        out, cache, h_t, rng = carry

        def depth_body(di, inner):
            codes_t, rng = inner
            logits = transformer.apply(
                variables, h_t, codes_t, di, method="depth_logits_step"
            )
            rng, sub = jax.random.split(rng)
            tok = sample_from_logits(
                sub, logits / temperature, 1.0, top_k, top_p, True
            ).astype(jnp.int32)
            codes_t = jax.lax.dynamic_update_slice(codes_t, tok[:, None], (0, di))
            return codes_t, rng

        codes_t, rng = jax.lax.fori_loop(
            0, d, depth_body, (jnp.zeros((b, d), jnp.int32), rng)
        )
        out = jax.lax.dynamic_update_slice(out, codes_t[:, None, :], (0, t, 0))
        emb = transformer.apply(variables, codes_t, t, method="embed_codes_at")
        h_t, cache = transformer.apply(variables, emb, cache, lc + t,
                                       method="spatial_step")
        return out, cache, h_t, rng

    out, *_ = jax.lax.fori_loop(0, t_total, position_body, (out, cache, h_t, rng))
    return out.reshape(b, hh, ww, d)

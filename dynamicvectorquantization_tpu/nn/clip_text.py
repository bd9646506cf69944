"""From-scratch CLIP text transformer (JAX/flax).

Replaces the reference's vendored OpenAI CLIP text tower
(`modules/text_encoders/clip_text_encoder/clip/model.py:152-300` and the
`CLIPTextEmbedding` wrapper at `clip_text_embedding.py:9-91`). TPU-first
re-design: batch-major einsum attention under one jit (the torch original
runs seq-major nn.MultiheadAttention per block), static 77-token context,
bf16-friendly.

OpenAI CLIP checkpoints convert via
`utils.torch_ckpt.convert_clip_text_state_dict` (set ``DQVQ_CLIP_WEIGHTS``
to a state_dict .pt/.pth of the CLIP model — the reference itself downloads
this at runtime; zero-egress here, so it is an explicit input).
"""
from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# width / layers / heads / embed_dim of the text towers of the published
# CLIP models the reference can name via `clip_name`.
CLIP_TEXT_CONFIGS = {
    "ViT-B/32": dict(width=512, layers=12, heads=8, embed_dim=512),
    "ViT-B/16": dict(width=512, layers=12, heads=8, embed_dim=512),
    "ViT-L/14": dict(width=768, layers=12, heads=12, embed_dim=768),
    "RN50": dict(width=512, layers=12, heads=8, embed_dim=1024),
}


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block: causal MHA + QuickGELU MLP (clip model.py:166-187)."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        b, t, w = x.shape
        hd = w // self.heads
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * w, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(z):
            return jnp.transpose(z.reshape(b, t, self.heads, hd), (0, 2, 1, 3))

        q, k, v = map(heads_first, (q, k, v))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, x.dtype)
        )
        logits = logits + mask
        att = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, w)
        x = x + nn.Dense(w, name="out_proj")(out)

        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * w, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(w, name="c_proj")(h)
        return x + h


class CLIPTextTransformer(nn.Module):
    """Token+positional embedding, N causal blocks, ln_final, projection."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, T) int32. Returns (seq_features, pooled):
        (B, T, width) post-ln_final sequence and the eot embedding @
        text_projection (B, embed_dim)."""
        tok_emb = nn.Embed(self.vocab_size, self.width,
                           embedding_init=nn.initializers.normal(0.02),
                           name="token_embedding")
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        t = tokens.shape[1]
        x = tok_emb(tokens) + pos[:t]
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, x.dtype), k=1)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       name=f"resblock_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
        )
        eot_pos = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(
            x, eot_pos[:, None, None].astype(jnp.int32), axis=1
        )[:, 0] @ proj
        return x, pooled


class CLIPTextEmbedding:
    """Reference `clip_text_embedding.py:9-91` semantics on the JAX tower.

    `encode_text` / `__call__` replicate: negative-token clamp, optional
    eot pooling (`pick_last_embedding`), `keep_seq_len_dim`, the
    1024-dim duplication hack, L2 `normalize`, and
    `additional_last_embedding`.
    """

    def __init__(
        self,
        clip_name: str = "ViT-B/32",
        num_embed: int = 49408,
        normalize: bool = True,
        pick_last_embedding: bool = True,
        keep_seq_len_dim: bool = False,
        additional_last_embedding: bool = False,
        embed_dim: int = 512,
        weights_path: Optional[str] = None,
        seed: int = 0,
    ):
        cfg = CLIP_TEXT_CONFIGS.get(clip_name, CLIP_TEXT_CONFIGS["ViT-B/32"])
        self.model = CLIPTextTransformer(vocab_size=num_embed, **cfg)
        self.normalize = normalize
        self.pick_last_embedding = pick_last_embedding
        self.keep_seq_len_dim = keep_seq_len_dim
        self.additional_last_embedding = additional_last_embedding
        # reference (`modules/text_encoders/clip_text_embedding.py`): sets
        # self.embed_dim = proj.shape[1] * 2 and duplicates features only when
        # the REALIZED width*2 == 1024 — not whatever embed_dim was requested
        # (a 768-wide ViT-L tower must NOT emit 1536-d duplicated features).
        self._double = cfg["embed_dim"] * 2 == 1024
        self.embed_dim = cfg["embed_dim"] * 2 if self._double else cfg["embed_dim"]

        weights_path = weights_path or os.environ.get("DQVQ_CLIP_WEIGHTS")
        if weights_path and os.path.exists(weights_path):
            from ..utils.torch_ckpt import (
                convert_clip_text_state_dict,
                load_torch_state_dict,
            )

            self.variables = convert_clip_text_state_dict(
                load_torch_state_dict(weights_path), layers=cfg["layers"]
            )
        else:  # seeded random init: runnable/testable without weights
            dummy = jnp.zeros((1, self.model.context_length), jnp.int32)
            self.variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        self._apply = jax.jit(self.model.apply)

    def encode_text(self, tokens):
        tokens = jnp.maximum(jnp.asarray(tokens, jnp.int32), 0)  # ref :49
        seq, pooled = self._apply(self.variables, tokens)
        if self.pick_last_embedding:
            x = pooled
            if self.keep_seq_len_dim:
                x = x[:, None, :]
            return x
        return seq

    def __call__(self, index):
        index = jnp.asarray(index)
        assert index.ndim == 2
        # one tower forward: both the picked features and the
        # additional_last_embedding derive from the same (seq, pooled) pair
        tokens = jnp.maximum(index.astype(jnp.int32), 0)  # ref :49
        seq, pooled = self._apply(self.variables, tokens)
        feats = pooled if self.pick_last_embedding else seq
        if self.pick_last_embedding and self.keep_seq_len_dim:
            feats = feats[:, None, :]
        text_features = (
            jnp.concatenate([feats, feats], axis=-1) if self._double else feats
        )
        if self.normalize:
            text_features = text_features / jnp.linalg.norm(
                text_features, axis=-1, keepdims=True
            )
        if self.additional_last_embedding:
            last = pooled
            if self.keep_seq_len_dim:
                last = last[:, None, :]
            return text_features, last
        return text_features

    forward = __call__

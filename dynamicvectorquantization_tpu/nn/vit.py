"""ViT encoder/decoder + PositionAwareGPT (legacy experimental family).

Reference:
  * `modules/transformer/vit.py:11-110` — VisionTransformerEncoder (patch
    embed -> pre-LN blocks) and VisionTransformerDecoder (blocks -> linear
    -> tanh -> linear -> unpatch), the "ViT-VQGAN"-style codec experiments;
  * `modules/transformer/position_aware_mingpt.py:104-168` — PositionAwareGPT:
    one transformer over token+position embeddings with separate value and
    position heads (predecessor of StackedPositionGPT/StackGPT);
  * `modules/diffusionmodules/attn_model.py` — attention-decoder experiments
    (covered by the decoder here).

NHWC; built on the shared `nn/transformer.py` blocks (bidirectional for the
codec: causal masking disabled via full-attention blocks below).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .activations import gelu

from .fourier import PositionEmbedding2DLearned
from .init import normal_init, trunc_normal_init
from .transformer import TransformerStack


class _BidirBlock(nn.Module):
    """Pre-LN transformer block with FULL (non-causal) attention."""

    n_embd: int
    n_head: int
    drop: float = 0.0
    attn_drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        b, t, c = h.shape
        hd = c // self.n_head
        dense = lambda name: nn.Dense(c, kernel_init=trunc_normal_init(0.02), name=name)
        split = lambda z: z.reshape(b, t, self.n_head, hd).transpose(0, 2, 1, 3)
        q, k, v = split(dense("query")(h)), split(dense("key")(h)), split(dense("value")(h))
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.attn_drop)(att, deterministic=deterministic)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(b, t, c)
        x = x + nn.Dropout(self.drop)(dense("proj")(y), deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Dense(4 * c, kernel_init=trunc_normal_init(0.02), name="mlp_fc")(h)
        h = gelu(h)  # dtype-gated fast GELU (nn/activations.py)
        h = nn.Dense(c, kernel_init=trunc_normal_init(0.02), name="mlp_proj")(h)
        return x + nn.Dropout(self.drop)(h, deterministic=deterministic)


class VisionTransformerEncoder(nn.Module):
    image_size: int = 256
    patch_size: int = 8
    input_channel: int = 3
    embed_dim: int = 256
    depth: int = 8
    num_heads: int = 8
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    init_type: str = "default"
    pos_embed_type: str = "learned"

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        hw = self.image_size // self.patch_size
        p = self.patch_size
        b, H, W, C = images.shape
        x = images.reshape(b, hw, p, hw, p, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, hw, hw, p * p * C)
        x = nn.Dense(self.embed_dim, kernel_init=trunc_normal_init(0.02),
                     name="patch_embed")(x)
        x = PositionEmbedding2DLearned(hw, self.embed_dim, name="pos_emb")(x)
        x = x.reshape(b, hw * hw, self.embed_dim)
        for i in range(self.depth):
            x = _BidirBlock(self.embed_dim, self.num_heads, self.drop_rate,
                            self.attn_drop_rate, name=f"block_{i}")(
                x, deterministic=deterministic)
        return x.reshape(b, hw, hw, self.embed_dim)


class VisionTransformerDecoder(nn.Module):
    image_size: int = 256
    patch_size: int = 8
    embed_dim: int = 256
    depth: int = 8
    num_heads: int = 8
    output_channel: int = 3
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    init_type: str = "default"
    pos_embed_type: str = "learned"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hw = self.image_size // self.patch_size
        p = self.patch_size
        b = x.shape[0]
        x = x.reshape(b, hw, hw, self.embed_dim)
        x = PositionEmbedding2DLearned(hw, self.embed_dim, name="pos_emb")(x)
        x = x.reshape(b, hw * hw, self.embed_dim)
        for i in range(self.depth):
            x = _BidirBlock(self.embed_dim, self.num_heads, self.drop_rate,
                            self.attn_drop_rate, name=f"block_{i}")(
                x, deterministic=deterministic)
        out_dim = p * p * self.output_channel
        x = nn.Dense(out_dim, kernel_init=trunc_normal_init(0.02),
                     name="output_linear1")(x)
        x = jnp.tanh(x)
        x = nn.Dense(out_dim, kernel_init=trunc_normal_init(0.02), name="conv_out")(x)
        x = x.reshape(b, hw, hw, p, p, self.output_channel)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, hw * p, hw * p, self.output_channel)


class PositionAwareGPT(nn.Module):
    """One causal transformer over token+position embeddings with separate
    value/position heads (reference `position_aware_mingpt.py:104-168`)."""

    vocab_size: int = 1024
    position_size: int = 256
    block_size: int = 512
    n_layer: int = 12
    n_head: int = 8
    n_embd: int = 256
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    n_unmasked: int = 0

    @nn.compact
    def __call__(self, idx, pos_idx, embeddings=None, train: bool = False):
        deterministic = not train
        tok = nn.Embed(self.vocab_size, self.n_embd,
                       embedding_init=normal_init(0.02), name="tok_emb")(idx)
        tpos = nn.Embed(self.position_size, self.n_embd,
                        embedding_init=normal_init(0.02), name="token_pos_emb")(pos_idx)
        x = tok + tpos
        if embeddings is not None:
            x = jnp.concatenate([embeddings, x], axis=1)
        t = x.shape[1]
        pos_emb = self.param("pos_emb", nn.initializers.zeros,
                             (1, self.block_size, self.n_embd))
        x = x + pos_emb[:, :t, :]
        x = nn.Dropout(self.embd_pdrop)(x, deterministic=deterministic)
        x, _ = TransformerStack(
            num_layers=self.n_layer, n_embd=self.n_embd, n_head=self.n_head,
            attn_pdrop=self.attn_pdrop, resid_pdrop=self.resid_pdrop, name="blocks",
        )(x, deterministic=deterministic)
        value_logits = nn.Dense(self.vocab_size, use_bias=False,
                                kernel_init=normal_init(0.02), name="head")(
            nn.LayerNorm(epsilon=1e-5, name="ln_f")(x))
        pos_logits = nn.Dense(self.position_size, use_bias=False,
                              kernel_init=normal_init(0.02), name="head_pos")(
            nn.LayerNorm(epsilon=1e-5, name="ln_f_pos")(x))
        return value_logits, pos_logits

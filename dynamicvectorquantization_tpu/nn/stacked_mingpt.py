"""StackedPositionGPT — the single-position-vocab ancestor of StackGPT.

Reference: `modules/transformer/stacked_mingpt.py:107-264` — one position
embedding table (vs StackGPT's separate coarse/fine tables), a
position-transformer predicting the next position and a value-transformer
predicting the value at that (shifted) position.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .init import normal_init
from .stackgpt import cross_entropy_ignore
from .transformer import TransformerStack


class StackedPositionGPT(nn.Module):
    vocab_size: int = 1024
    position_size: int = 1024
    block_size: int = 512
    position_layer: int = 12
    value_layer: int = 12
    n_head: int = 8
    n_embd: int = 256
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    n_unmasked: int = 0
    add_absolute_position: bool = True

    def setup(self):
        self.value_pos_emb = nn.Embed(
            self.position_size, self.n_embd, embedding_init=normal_init(0.02),
            name="value_pos_emb",
        )
        self.value_emb = nn.Embed(
            self.vocab_size, self.n_embd, embedding_init=normal_init(0.02),
            name="value_emb",
        )
        if self.add_absolute_position:
            self.pos_emb = self.param(
                "pos_emb", nn.initializers.zeros, (1, self.block_size, self.n_embd)
            )
        self.drop = nn.Dropout(self.embd_pdrop)
        stack = lambda n, name: TransformerStack(
            num_layers=n, n_embd=self.n_embd, n_head=self.n_head,
            attn_pdrop=self.attn_pdrop, resid_pdrop=self.resid_pdrop, name=name,
        )
        self.position_transformer = stack(self.position_layer, "position_transformer")
        self.value_transformer = stack(self.value_layer, "value_transformer")
        self.position_head_ln = nn.LayerNorm(epsilon=1e-5, name="position_head_ln")
        self.position_head = nn.Dense(
            self.position_size, use_bias=False, kernel_init=normal_init(0.02),
            name="position_head",
        )
        self.value_head_ln = nn.LayerNorm(epsilon=1e-5, name="value_head_ln")
        self.value_head = nn.Dense(
            self.vocab_size, use_bias=False, kernel_init=normal_init(0.02),
            name="value_head",
        )

    def __call__(self, idx, pos_idx, idx_target=None, pos_idx_target=None,
                 train: bool = False, **_):
        """idx/pos_idx both start with their SOS token; targets are the
        shifted streams (reference `stacked_mingpt.py:161-210`)."""
        deterministic = not train
        x = self.value_emb(idx[:, :-1]) + self.value_pos_emb(pos_idx[:, :-1])
        t = x.shape[1]
        if self.add_absolute_position:
            x = x + self.pos_emb[:, :t, :]
        x = self.drop(x, deterministic=deterministic)

        position_hidden, _ = self.position_transformer(x, deterministic=deterministic)
        position_logits = self.position_head(self.position_head_ln(position_hidden))

        value_in = position_hidden + self.value_pos_emb(pos_idx[:, 1:])
        value_hidden, _ = self.value_transformer(value_in, deterministic=deterministic)
        value_logits = self.value_head(self.value_head_ln(value_hidden))

        if idx_target is None:
            return {"position_logits": position_logits, "value_logits": value_logits}
        return {
            "position_loss": cross_entropy_ignore(position_logits, pos_idx_target, -100),
            "value_loss": cross_entropy_ignore(value_logits, idx_target, -100),
        }

    def get_block_size(self):
        return self.block_size

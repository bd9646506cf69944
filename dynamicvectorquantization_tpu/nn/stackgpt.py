"""StackGPT — the DQ-Transformer: a stacked Position-Transformer +
Content-Transformer over the variable-length dual-grain code sequence.

Reference semantics (`modules/dynamic_modules/stackgpt.py:98-232`):

  * shared content embedding table; *separate* coarse/fine position tables;
    learned absolute `pos_emb` (zero-init — the reference's `_init_weights`
    never touches bare Parameters); segment table;
  * Position-Transformer input (token i) =
        content_emb(content[i]) + pos_table(position[i]) + pos_emb[i] + seg[i]
    over the concatenated [coarse ; fine] streams (content shifted off by one:
    the model predicts position i+1 from tokens <= i);
  * Content-Transformer input (token i) = position_hidden[i] +
    pos_table(position[i+1])  — i.e. *shifted* position embeddings, telling it
    WHERE the content it must predict goes (`stackgpt.py:204-207`);
  * heads: LayerNorm + bias-free Linear; position head always has
    fine_position_size outputs (coarse position codes live in its low range);
  * losses: CE with pad ignore_index; position loss = mean of the coarse and
    fine halves split at coarse_length-1 (`stackgpt.py:216-221`).

Torch-quirk note (replicated): `_init_weights` re-initializes *all* embedding
rows normal(0.02), including the `padding_idx` rows that nn.Embedding had
zeroed — so pad rows are random-but-frozen vectors. We init all rows
normal(0.02) and freeze pad rows via the optimizer gradient mask
(`train/stage2.py`).

TPU-native decode: `position_step` / `content_step` run ONE token through the
stacks against a KV cache (`nn/transformer.py`) — replacing the reference's
full-prefix recompute per sampled token.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .init import normal_init
from .norm import FusedLayerNorm
from .transformer import KVCache, TransformerStack


def cross_entropy_ignore(logits, targets, ignore_index: int):
    """Mean CE over positions where target != ignore_index (torch
    F.cross_entropy(ignore_index=...) semantics)."""
    # always reduce in f32: under the bf16 mixed-precision train path the
    # logits arrive bf16, and log-softmax accuracy bounds the loss signal
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    mask = (targets != ignore_index).astype(logits.dtype)
    safe_targets = jnp.where(targets == ignore_index, 0, targets)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / denom


class StackGPT(nn.Module):
    vocab_size: int = 1027
    coarse_position_size: int = 259
    fine_position_size: int = 1027
    segment_size: int = 2  # <=0 disables segment embeddings
    block_size: int = 2048
    position_layer: int = 6
    content_layer: int = 18
    n_head: int = 8
    n_embd: int = 1024
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    content_pad_code: int = 1024
    coarse_position_pad_code: int = 256
    fine_position_pad_code: int = 1024
    activate_pad_ignore: bool = True
    # Batch-invariance option absent in the reference (which attends pad keys;
    # see models/permuter.py docstring). Off by default for reference parity.
    mask_pad_attention: bool = False
    # Pallas flash attention for training (skips attn_pdrop; see
    # nn/transformer.py). Off by default for reference parity.
    use_flash_attention: bool = False
    # "int8": decode KV caches quantized per (batch, head, position)
    # (ops/kv_int8.py) — halves the HBM stream that dominates sampling.
    # None: caches follow the param dtype passed to make_caches.
    kv_cache_dtype: str | None = None
    # Sequence parallelism: set to a mesh axis name (e.g. "sp") and apply the
    # training forward inside shard_map with the sequence sharded on it —
    # both stacks then use ring attention (parallel/ring_attention.py). Use
    # `parallel.stackgpt_sp.stackgpt_forward_sp` for the full orchestration.
    sequence_parallel_axis: str | None = None
    # t2i CONSUMING variant (off = reference parity, QUIRKS #18): the content
    # transformer cross-attends to projected text features passed as
    # `text_memory` (B, S, text_feature_dim). Extra params (text_proj +
    # per-block xattn) exist only when enabled.
    cross_attend_content: bool = False
    text_feature_dim: int = 512

    def setup(self):
        emb = lambda n, name: nn.Embed(
            n, self.n_embd, embedding_init=normal_init(0.02), name=name
        )
        self.content_emb = emb(self.vocab_size, "content_emb")
        self.content_coarse_pos_emb = emb(self.coarse_position_size, "content_coarse_pos_emb")
        self.content_fine_pos_emb = emb(self.fine_position_size, "content_fine_pos_emb")
        self.pos_emb = self.param(
            "pos_emb", nn.initializers.zeros, (1, self.block_size, self.n_embd)
        )
        self.activate_segment = self.segment_size > 0
        if self.activate_segment:
            self.seg_emb = emb(self.segment_size, "seg_emb")
        self.drop = nn.Dropout(self.embd_pdrop)

        stack = lambda n, name: TransformerStack(
            num_layers=n,
            n_embd=self.n_embd,
            n_head=self.n_head,
            attn_pdrop=self.attn_pdrop,
            resid_pdrop=self.resid_pdrop,
            use_flash_attention=self.use_flash_attention,
            sequence_parallel_axis=self.sequence_parallel_axis,
            name=name,
        )
        self.position_transformer = stack(self.position_layer, "position_transformer")
        if self.cross_attend_content:
            self.content_transformer = TransformerStack(
                num_layers=self.content_layer,
                n_embd=self.n_embd,
                n_head=self.n_head,
                attn_pdrop=self.attn_pdrop,
                resid_pdrop=self.resid_pdrop,
                use_flash_attention=self.use_flash_attention,
                sequence_parallel_axis=self.sequence_parallel_axis,
                cross_attend=True,
                name="content_transformer",
            )
            self.text_proj = nn.Dense(
                self.n_embd, kernel_init=normal_init(0.02), name="text_proj"
            )
        else:
            self.content_transformer = stack(self.content_layer, "content_transformer")

        self.position_head_ln = FusedLayerNorm(epsilon=1e-5, name="position_head_ln")
        self.position_head = nn.Dense(
            self.fine_position_size, use_bias=False, kernel_init=normal_init(0.02),
            name="position_head",
        )
        self.content_head_ln = FusedLayerNorm(epsilon=1e-5, name="content_head_ln")
        self.content_head = nn.Dense(
            self.vocab_size, use_bias=False, kernel_init=normal_init(0.02),
            name="content_head",
        )

    # ------------------------------------------------------------- training
    def __call__(
        self,
        coarse_content,
        fine_content,
        coarse_position,
        fine_position,
        coarse_seg=None,
        fine_seg=None,
        content_target=None,
        coarse_position_target=None,
        fine_position_target=None,
        train: bool = False,
        text_memory=None,
        text_mask=None,
        **_,
    ):
        deterministic = not train
        coarse_length = coarse_position.shape[1]

        x, shifted_position_embeddings, attn_bias = self.embed_training_inputs(
            coarse_content, fine_content, coarse_position, fine_position,
            coarse_seg, fine_seg, train=train,
        )
        out = self.forward_from_embeddings(
            x, shifted_position_embeddings, attn_bias=attn_bias, train=train,
            text_memory=text_memory, text_mask=text_mask,
        )
        position_logits = out["position_logits"]
        content_logits = out["content_logits"]

        if content_target is None:
            return {"position_logits": position_logits, "content_logits": content_logits}

        return self.losses_from_logits(
            position_logits, content_logits, content_target,
            coarse_position_target, fine_position_target, coarse_length,
        )

    def losses_from_logits(
        self,
        position_logits,
        content_logits,
        content_target,
        coarse_position_target,
        fine_position_target,
        coarse_length: int,
    ):
        """CE losses from the training logits. Pure config (no params), so
        it is also callable OUTSIDE `apply` — the sp/pp training paths
        (`parallel/stackgpt_sp.py`, `parallel/stackgpt_pp.py`) produce
        logits through shard_map and reuse this exact loss block; the
        slices/reductions over mesh-sharded logits compile to local
        reductions + a scalar psum under GSPMD."""
        if self.activate_pad_ignore:
            split = coarse_length - 1
            cpl = cross_entropy_ignore(
                position_logits[:, :split], coarse_position_target,
                self.coarse_position_pad_code,
            )
            fpl = cross_entropy_ignore(
                position_logits[:, split:], fine_position_target,
                self.fine_position_pad_code,
            )
            closs = cross_entropy_ignore(
                content_logits, content_target, self.content_pad_code
            )
        else:
            # reference stackgpt.py:225-231: only the CONTENT CE drops its
            # ignore_index in this branch; both position CEs keep theirs
            split = coarse_length
            cpl = cross_entropy_ignore(
                position_logits[:, :split], coarse_position_target,
                self.coarse_position_pad_code,
            )
            fpl = cross_entropy_ignore(
                position_logits[:, split:], fine_position_target,
                self.fine_position_pad_code,
            )
            closs = cross_entropy_ignore(content_logits, content_target, -1)

        return {
            "position_loss": (cpl + fpl) / 2.0,
            "content_loss": closs,
            "coarse_position_loss": cpl,
            "fine_position_loss": fpl,
        }

    def embed_training_inputs(
        self,
        coarse_content,
        fine_content,
        coarse_position,
        fine_position,
        coarse_seg=None,
        fine_seg=None,
        train: bool = False,
    ):
        """Dense (unsharded) half of the training forward: token/position/
        segment/absolute embeddings for the position transformer, the SHIFTED
        position embeddings for the content transformer (reference
        `stackgpt.py:204-207`), and the optional pad-key attention bias.
        Split out so sequence parallelism can compute these cheaply outside
        shard_map (`parallel/stackgpt_sp.py`)."""
        deterministic = not train
        content = jnp.concatenate([coarse_content, fine_content], axis=1)
        content_embeddings = self.content_emb(content[:, :-1])

        position_embeddings = jnp.concatenate(
            [
                self.content_coarse_pos_emb(coarse_position),
                self.content_fine_pos_emb(fine_position[:, :-1]),
            ],
            axis=1,
        )
        t = position_embeddings.shape[1]
        position_embeddings = position_embeddings + self.pos_emb[:, :t, :]

        x = content_embeddings + position_embeddings
        if self.activate_segment:
            segment = jnp.concatenate([coarse_seg, fine_seg], axis=1)
            x = x + self.seg_emb(segment[:, :-1])
        x = self.drop(x, deterministic=deterministic)

        attn_bias = None
        if self.mask_pad_attention:
            is_pad = content[:, :-1] == self.content_pad_code  # (B, T)
            attn_bias = jnp.where(is_pad[:, None, None, :], -1e9, 0.0)

        shifted_position_embeddings = jnp.concatenate(
            [
                self.content_coarse_pos_emb(coarse_position[:, 1:]),
                self.content_fine_pos_emb(fine_position),
            ],
            axis=1,
        )
        return x, shifted_position_embeddings, attn_bias

    def forward_from_embeddings(
        self, x, shifted_position_embeddings, attn_bias=None, train: bool = False,
        text_memory=None, text_mask=None,
    ):
        """Sharded-friendly half: both block stacks + heads. Everything here
        is elementwise along the sequence except attention itself, so under
        `sequence_parallel_axis` this is the exact region to shard_map."""
        deterministic = not train
        position_hidden, _ = self.position_transformer(
            x, deterministic=deterministic, attn_bias=attn_bias
        )
        memory = None
        if self.cross_attend_content and text_memory is not None:
            memory = self.text_proj(text_memory.astype(x.dtype))
        content_hidden, _ = self.content_transformer(
            position_hidden + shifted_position_embeddings,
            deterministic=deterministic,
            attn_bias=attn_bias,
            memory=memory,
            memory_mask=text_mask,
        )
        content_logits = self.content_head(self.content_head_ln(content_hidden))
        position_logits = self.position_head(self.position_head_ln(position_hidden))
        return {
            "position_logits": position_logits,
            "content_logits": content_logits,
        }

    # ------------------------------------------------------------ decoding
    def make_caches(self, batch: int, max_len: int, dtype=jnp.float32):
        hd = self.n_embd // self.n_head
        # round capacity to the decode-attention chunk so single-token steps
        # read only the valid cache prefix (nn/transformer.py)
        from .transformer import _DECODE_CHUNK

        max_len = ((max_len + _DECODE_CHUNK - 1) // _DECODE_CHUNK) * _DECODE_CHUNK
        if self.kv_cache_dtype == "int8":
            return (
                KVCache.create_int8(self.position_layer, batch, self.n_head, max_len, hd),
                KVCache.create_int8(self.content_layer, batch, self.n_head, max_len, hd),
            )
        assert self.kv_cache_dtype is None, self.kv_cache_dtype
        return (
            KVCache.create(self.position_layer, batch, self.n_head, max_len, hd, dtype),
            KVCache.create(self.content_layer, batch, self.n_head, max_len, hd, dtype),
        )

    def embed_input_token(self, content_tok, pos_tok, seg_tok, index, is_fine: bool):
        """Position-transformer input embedding for ONE token at global
        position `index` (B,) -> (B, 1, D)."""
        e = self.content_emb(content_tok)
        pe = (
            self.content_fine_pos_emb(pos_tok)
            if is_fine
            else self.content_coarse_pos_emb(pos_tok)
        )
        x = e + pe + jax.lax.dynamic_slice_in_dim(self.pos_emb[0], index, 1, axis=0)
        if self.activate_segment and seg_tok is not None:
            x = x + self.seg_emb(seg_tok)
        return x[:, None, :]

    def position_step(self, x, cache: KVCache, index):
        """One cached position-transformer step. x: (B, 1, D)."""
        hidden, cache = self.position_transformer(
            x, deterministic=True, cache=cache, cache_index=index
        )
        logits = self.position_head(self.position_head_ln(hidden[:, 0]))
        return hidden, logits, cache

    def content_step(self, position_hidden, next_pos_tok, is_fine: bool, cache: KVCache, index,
                     text_memory=None, text_mask=None):
        """One cached content-transformer step: input = hidden + emb(next pos).
        `text_memory` enables text-conditional decode under
        `cross_attend_content` (memory k/v are short, recomputed per step)."""
        pe = (
            self.content_fine_pos_emb(next_pos_tok)
            if is_fine
            else self.content_coarse_pos_emb(next_pos_tok)
        )
        x = position_hidden + pe[:, None, :]
        memory = None
        if self.cross_attend_content and text_memory is not None:
            memory = self.text_proj(text_memory.astype(x.dtype))
        hidden, cache = self.content_transformer(
            x, deterministic=True, cache=cache, cache_index=index,
            memory=memory, memory_mask=text_mask,
        )
        logits = self.content_head(self.content_head_ln(hidden[:, 0]))
        return logits, cache

    def get_block_size(self):
        return self.block_size

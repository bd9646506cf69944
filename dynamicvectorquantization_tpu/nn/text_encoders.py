"""Text encoders for the text-to-image stage-2 variant.

Reference: `modules/text_encoders/` (~2000 LoC: a vendored CLIP with BPE
tokenizer, x-transformers, BERT wrappers) feeding
`models/stage2_dynamic/dqtransformer_t2i.py`. Note the shipped t2i variant
passes `cond=text_features` into StackGPT's ``**ignorekwargs`` — the text
features are computed but never consumed (see QUIRKS.md) — and no t2i config
ships.

Here: HuggingFace `transformers` wrappers (CLIP text tower / BERT) loading
from a LOCAL model path (zero-egress environment), plus a deterministic
hash-embedding fallback encoder so the t2i pipeline is runnable/testable
without pretrained weights.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class HashTextEncoder:
    """Dependency-free fallback: tokenizes by whitespace, embeds via seeded
    hash projections. Deterministic; for pipeline tests, not semantics."""

    def __init__(self, embed_dim=512, max_length=77, vocab_hash_buckets=4096, seed=0):
        self.embed_dim = embed_dim
        self.max_length = max_length
        self.buckets = vocab_hash_buckets
        rng = np.random.default_rng(seed)
        self.table = rng.normal(0, 0.02, (vocab_hash_buckets, embed_dim)).astype(
            np.float32
        )

    def encode_text(self, texts):
        out = np.zeros((len(texts), self.max_length, self.embed_dim), np.float32)
        mask = np.zeros((len(texts), self.max_length), np.float32)
        for i, t in enumerate(texts):
            words = str(t).lower().split()[: self.max_length]
            for j, w in enumerate(words):
                out[i, j] = self.table[hash(w) % self.buckets]
                mask[i, j] = 1.0
        return jnp.asarray(out), jnp.asarray(mask)


class CLIPTextEncoder:
    """CLIP text tower via HuggingFace transformers (local weights path)."""

    def __init__(self, model_path: str, max_length: int = 77):
        from transformers import CLIPTextModel, CLIPTokenizer

        self.tokenizer = CLIPTokenizer.from_pretrained(model_path)
        self.model = CLIPTextModel.from_pretrained(model_path).eval()
        self.max_length = max_length

    def encode_text(self, texts):
        import torch

        with torch.no_grad():
            toks = self.tokenizer(
                list(texts), padding="max_length", truncation=True,
                max_length=self.max_length, return_tensors="pt",
            )
            out = self.model(**toks).last_hidden_state
        return jnp.asarray(out.numpy()), jnp.asarray(
            toks["attention_mask"].numpy().astype(np.float32)
        )


class BERTTextEncoder:
    """BERT via HuggingFace transformers (local weights path)."""

    def __init__(self, model_path: str, max_length: int = 77):
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModel.from_pretrained(model_path).eval()
        self.max_length = max_length

    def encode_text(self, texts):
        import torch

        with torch.no_grad():
            toks = self.tokenizer(
                list(texts), padding="max_length", truncation=True,
                max_length=self.max_length, return_tensors="pt",
            )
            out = self.model(**toks).last_hidden_state
        return jnp.asarray(out.numpy()), jnp.asarray(
            toks["attention_mask"].numpy().astype(np.float32)
        )


class NativeCLIPTextEncoder:
    """From-scratch CLIP text tower + byte-level BPE (`nn/clip_text.py`,
    `utils/clip_bpe.py`) behind the same `encode_text(texts) -> (features,
    mask)` interface as the HF wrappers — fully dependency-free: OpenAI CLIP
    weights convert in via DQVQ_CLIP_WEIGHTS / the BPE table via
    DQVQ_CLIP_BPE, otherwise a seeded random tower + byte-level vocab keep
    the t2i pipeline runnable."""

    def __init__(self, clip_name: str = "ViT-B/32", max_length: int = 77,
                 weights_path=None, bpe_path=None, seed: int = 0):
        from ..utils.clip_bpe import ClipBPETokenizer
        from .clip_text import CLIPTextEmbedding

        self.tokenizer = ClipBPETokenizer(bpe_path=bpe_path)
        self.embedding = CLIPTextEmbedding(
            clip_name=clip_name, num_embed=max(self.tokenizer.vocab_size, 49408),
            pick_last_embedding=False, normalize=False,
            weights_path=weights_path, seed=seed,
        )
        self.max_length = max_length

    def encode_text(self, texts):
        from ..utils.clip_bpe import tokenize

        toks = tokenize(list(texts), context_length=self.max_length,
                        tokenizer=self.tokenizer)
        feats = self.embedding.encode_text(jnp.asarray(toks["token"]))
        return feats, jnp.asarray(toks["mask"], jnp.float32)

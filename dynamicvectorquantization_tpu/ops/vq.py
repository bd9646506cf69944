"""EMA vector quantizer with masked commitment loss and unused-code restart.

TPU-native re-implementation of the reference's flagship quantizer
(`modules/vector_quantization/quantize2_mask.py`):

  * codebook of ``codebook_size + 1`` rows — the extra row is the padding code
    used by stage 2 (kept at zero, never EMA-updated);
  * nearest-code lookup via the fused Pallas kernel (`ops.vq_pallas`);
  * straight-through estimator and commitment loss weighted by the per-position
    granularity ``codebook_mask`` (0.25 coarse / 1.0 fine, reference
    `quantize2_mask.py:172-179`);
  * EMA cluster statistics with Laplace-smoothed weight refresh
    (`quantize2_mask.py:107-115`);
  * unused-code restart from randomly permuted input vectors
    (`quantize2_mask.py:93-105`).

Distributed semantics: the reference all-reduces cluster statistics across
DDP ranks and broadcasts rank-0's restart candidates. Under pjit/GSPMD the
statistics are *global by construction* (the one-hot reductions run over the
full global batch; XLA inserts the cross-device psum over ICI), and restart
candidates are drawn with a replicated PRNG key, so every device computes the
same restart deterministically — no manual collectives needed.

All EMA state lives in the flax variable collection ``"ema"``; pass
``mutable=["ema"]`` (and ``rngs={"vq": key}`` when restart is enabled) to
apply() during training.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .vq_pallas import nearest_codes, nearest_codes_with_stats


class VectorQuantizeEMA(nn.Module):
    codebook_size: int = 1024
    codebook_dim: int = 256
    accept_image_fmap: bool = True
    commitment_beta: float = 0.25
    decay: float = 0.99
    restart_unused_codes: bool = True
    channel_last: bool = True  # NHWC-native; kept for config compatibility
    ema: bool = True
    eps: float = 1e-5
    use_pallas: bool | None = None  # None = auto (pallas on TPU backend)

    def _init_codebook(self, key):
        k, d = self.codebook_size, self.codebook_dim
        # Reference init: uniform(-1/K, 1/K) for the K real codes
        # (quantize2_mask.py:155); padding row (index K) stays zero.
        cb = jax.random.uniform(key, (k + 1, d), jnp.float32, -1.0 / k, 1.0 / k)
        return cb.at[k].set(0.0)

    def setup(self):
        self.codebook = self.variable(
            "ema", "codebook", lambda: self._init_codebook(self.make_rng("params"))
        )
        self.cluster_size_ema = self.variable(
            "ema", "cluster_size_ema", jnp.zeros, (self.codebook_size,), jnp.float32
        )
        self.embed_ema = self.variable(
            "ema", "embed_ema", lambda: self.codebook.value[:-1].copy()
        )

    def __call__(self, x, codebook_mask=None, temp=0.0, train: bool = False, **_):
        """Quantize a feature map.

        Args:
          x: (B, H, W, D) NHWC feature map (or (B, N, D) if
             accept_image_fmap=False).
          codebook_mask: per-position commitment weight, (B, H, W, 1) or
             (B, N) / (B, N, 1); None = uniform.
          train: update EMA statistics + codebook (requires mutable "ema").

        Returns:
          (x_q, loss, (None, None, code_indices)) — mirroring the reference's
          return signature (`quantize2_mask.py:191`).
        """
        if self.accept_image_fmap:
            b, h, w, d = x.shape
            flat = x.reshape(b * h * w, d)
        else:
            b = x.shape[0]
            d = x.shape[-1]
            flat = x.reshape(-1, d)

        codebook = self.codebook.value[:-1]

        if train and self.ema:
            idx, xq_flat, embed_sum, cluster_size = nearest_codes_with_stats(
                flat, codebook, self.use_pallas
            )
            self._ema_update(flat, embed_sum, cluster_size)
        else:
            idx, xq_flat = nearest_codes(flat, codebook, self.use_pallas)

        x_q = xq_flat.reshape(x.shape)

        if codebook_mask is not None:
            mask = codebook_mask.reshape(x.shape[:-1] + (1,)).astype(x.dtype)
            loss = self.commitment_beta * jnp.mean(
                (jax.lax.stop_gradient(x_q) - x) ** 2 * mask
            ) + jnp.mean((x_q - jax.lax.stop_gradient(x)) ** 2 * mask)
        else:
            loss = self.commitment_beta * jnp.mean(
                (jax.lax.stop_gradient(x_q) - x) ** 2
            ) + jnp.mean((x_q - jax.lax.stop_gradient(x)) ** 2)

        # straight-through
        x_q = x + jax.lax.stop_gradient(x_q - x)

        if self.accept_image_fmap:
            code = idx.reshape(b, h, w)
        else:
            code = idx.reshape(x.shape[:-1])
        return x_q, loss, (None, None, code)

    def _ema_update(self, vectors, embed_sum, cluster_size):
        k, d = self.codebook_size, self.codebook_dim
        decay = self.decay
        vectors = jax.lax.stop_gradient(vectors)
        embed_sum = jax.lax.stop_gradient(embed_sum)
        cluster_size = jax.lax.stop_gradient(cluster_size)

        cluster_ema = self.cluster_size_ema.value * decay + cluster_size * (1 - decay)
        embed_ema = self.embed_ema.value * decay + embed_sum * (1 - decay)

        if self.restart_unused_codes:
            key = self.make_rng("vq")
            n_vectors = vectors.shape[0]
            if n_vectors < k:
                n_rep = (k + n_vectors - 1) // n_vectors
                noise_key, key = jax.random.split(key)
                tiled = jnp.tile(vectors, (n_rep, 1))
                std = 0.01 / jnp.sqrt(jnp.float32(d))
                tiled = tiled + jax.random.uniform(noise_key, tiled.shape) * std
                cand_pool = tiled
            else:
                cand_pool = vectors
            perm = jax.random.permutation(key, cand_pool.shape[0])
            candidates = cand_pool[perm[:k]]
            usage = (cluster_ema[:, None] >= 1.0).astype(jnp.float32)
            embed_ema = embed_ema * usage + candidates * (1.0 - usage)
            cluster_ema = cluster_ema * usage[:, 0] + (1.0 - usage[:, 0])

        self.cluster_size_ema.value = cluster_ema
        self.embed_ema.value = embed_ema

        n = jnp.sum(cluster_ema)
        normalized = n * (cluster_ema + self.eps) / (n + k * self.eps)
        new_weight = embed_ema / normalized[:, None]
        self.codebook.value = self.codebook.value.at[:-1].set(new_weight)

    def get_codebook_entry(self, indices):
        """Embed code indices (supports the padding code K). (B, ..., D)."""
        return jnp.take(self.codebook.value, indices, axis=0)

    def get_soft_codes(self, x, temp: float = 1.0, stochastic: bool = False, rng=None):
        codebook = self.codebook.value[:-1]
        flat = x.reshape(-1, x.shape[-1])
        d2 = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=1)[None, :]
            - 2.0 * flat @ codebook.T
        )
        soft = jax.nn.softmax(-d2 / temp, axis=-1)
        if stochastic:
            assert rng is not None
            code = jax.random.categorical(rng, jnp.log(soft + 1e-20), axis=-1)
        else:
            code = jnp.argmin(d2, axis=-1)
        soft = soft.reshape(x.shape[:-1] + (self.codebook_size,))
        code = code.reshape(x.shape[:-1])
        return soft, code

"""lucidrains-style vector quantizer: kmeans-initialized EMA codebook, cosine
codebook, dead-code expiry.

Reference: `modules/vector_quantization/quantize_lucidrains.py` +
`common_utils.py:43-158` (kmeans with distributed sample gathering). Legacy
in the reference (no shipped config uses it); provided for inventory parity.

Distributed note: the reference gathers samples across DDP ranks for kmeans
(`all_gather_variably_sized`, `sample_vectors_distributed`); under pjit/GSPMD
the input batch is already global inside the program, so kmeans here simply
operates on the (globally-sharded) vectors — XLA inserts the gathers.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def kmeans(key, samples, num_clusters: int, num_iters: int = 10, use_cosine: bool = False):
    """Plain kmeans (reference common_utils.kmeans): random-sample init,
    num_iters Lloyd steps. samples: (N, D)."""
    n = samples.shape[0]
    idx = jax.random.permutation(key, n)[:num_clusters]
    means = samples[idx % n]

    def step(means, _):
        if use_cosine:
            sims = _l2norm(samples) @ _l2norm(means).T
            assign = jnp.argmax(sims, axis=-1)
        else:
            d = (
                jnp.sum(samples**2, 1, keepdims=True)
                - 2 * samples @ means.T
                + jnp.sum(means**2, 1)[None]
            )
            assign = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(assign, num_clusters, dtype=samples.dtype)
        counts = onehot.sum(0)
        sums = onehot.T @ samples
        new_means = sums / jnp.maximum(counts[:, None], 1.0)
        new_means = jnp.where(counts[:, None] > 0, new_means, means)
        if use_cosine:
            new_means = _l2norm(new_means)
        return new_means, None

    means, _ = jax.lax.scan(step, means, None, length=num_iters)
    return means


def _l2norm(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class LucidrainsVectorQuantize(nn.Module):
    """EMA codebook with kmeans init (first training batch) and dead-code
    expiry by usage threshold. `use_cosine_sim=True` gives the cosine
    codebook (l2-normalized codes + inputs)."""

    codebook_size: int = 1024
    dim: int = 256
    decay: float = 0.99
    commitment_weight: float = 1.0
    eps: float = 1e-5
    threshold_ema_dead_code: int = 2
    kmeans_init: bool = True
    kmeans_iters: int = 10
    use_cosine_sim: bool = False
    use_pallas: Optional[bool] = None

    def setup(self):
        self.embed = self.variable(
            "ema", "embed",
            lambda: jax.random.normal(self.make_rng("params"),
                                      (self.codebook_size, self.dim)) * 0.02,
        )
        self.embed_avg = self.variable("ema", "embed_avg", lambda: self.embed.value.copy())
        self.cluster_size = self.variable(
            "ema", "cluster_size", jnp.zeros, (self.codebook_size,), jnp.float32
        )
        self.initted = self.variable(
            "ema", "initted", lambda: jnp.zeros((), jnp.bool_)
        )

    def __call__(self, x, train: bool = False, **_):
        from .vq_pallas import nearest_codes

        flat = x.reshape(-1, x.shape[-1])
        codebook = self.embed.value

        if train and self.kmeans_init:
            key = self.make_rng("vq")
            km = kmeans(key, flat, self.codebook_size, self.kmeans_iters,
                        self.use_cosine_sim)
            codebook = jnp.where(self.initted.value, codebook, km)

        if self.use_cosine_sim:
            flat_n = _l2norm(flat)
            cb_n = _l2norm(codebook)
            sims = flat_n @ cb_n.T
            idx = jnp.argmax(sims, axis=-1).astype(jnp.int32)
            xq_flat = jnp.take(codebook, idx, axis=0)
        else:
            idx, xq_flat = nearest_codes(flat, codebook, self.use_pallas)

        if train:
            onehot = jax.nn.one_hot(idx, self.codebook_size, dtype=flat.dtype)
            counts = onehot.sum(0)
            sums = onehot.T @ flat
            cluster = self.cluster_size.value * self.decay + counts * (1 - self.decay)
            avg = self.embed_avg.value * self.decay + sums * (1 - self.decay)
            if self.use_cosine_sim:
                new_embed = _l2norm(avg / jnp.maximum(cluster[:, None], self.eps))
            else:
                n = cluster.sum()
                smoothed = (cluster + self.eps) / (n + self.codebook_size * self.eps) * n
                new_embed = avg / smoothed[:, None]
            # dead-code expiry: replace rarely-used codes with batch samples
            if self.threshold_ema_dead_code > 0:
                key = self.make_rng("vq")
                n_flat = flat.shape[0]
                repl_idx = jax.random.randint(
                    key, (self.codebook_size,), 0, n_flat
                )
                repl = flat[repl_idx]
                if self.use_cosine_sim:
                    repl = _l2norm(repl)
                dead = cluster < self.threshold_ema_dead_code
                new_embed = jnp.where(dead[:, None], repl, new_embed)
                cluster = jnp.where(dead, self.threshold_ema_dead_code, cluster)
            self.cluster_size.value = jax.lax.stop_gradient(cluster)
            self.embed_avg.value = jax.lax.stop_gradient(avg)
            self.embed.value = jax.lax.stop_gradient(new_embed)
            self.initted.value = jnp.ones((), jnp.bool_)

        x_q = xq_flat.reshape(x.shape)
        commit = self.commitment_weight * jnp.mean(
            (jax.lax.stop_gradient(x_q) - x) ** 2
        )
        x_q = x + jax.lax.stop_gradient(x_q - x)
        code = idx.reshape(x.shape[:-1])
        return x_q, commit, (None, None, code)

    def get_codebook_entry(self, indices):
        return jnp.take(self.embed.value, indices, axis=0)

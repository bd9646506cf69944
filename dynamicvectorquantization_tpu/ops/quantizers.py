"""Legacy/alternative quantizers (the reference's non-flagship VQ family).

Reference surface:
  * `modules/vector_quantization/quantize_vqgan.py:9-108` — taming-style
    VectorQuantizer: codebook trained by GRADIENTS (not EMA), loss =
    ||sg(z) - e||^2 + beta ||z - sg(e)||^2;
  * `quantize_vqgan.py:213-341` — VectorQuantizer2 (argmin lookup, optional
    index remap, "sane" index shapes);
  * `quantize_vqgan.py:110-211` — GumbelQuantize: soft gumbel-softmax over
    code logits with KL-to-uniform regularizer;
  * `quantize_vqgan.py:343-457` — EMAVectorQuantizer (taming EMA flavor);
  * `quantize_rqvae.py:149-` — RQBottleneck: residual quantization of depth D
    against (shared or per-depth) EMA codebooks.

All NHWC flax modules returning the reference's (quant, loss, info) shape.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .vq_pallas import nearest_codes
from .vq import VectorQuantizeEMA


class VectorQuantizer(nn.Module):
    """Gradient-trained codebook (taming VectorQuantizer/VectorQuantizer2)."""

    n_e: int = 1024
    e_dim: int = 256
    beta: float = 0.25
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, z, codebook_mask=None, train: bool = False, **_):
        emb = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -1.0 / self.n_e, 1.0 / self.n_e),
            (self.n_e, self.e_dim),
        )
        flat = z.reshape(-1, self.e_dim)
        idx, _ = nearest_codes(jax.lax.stop_gradient(flat), jax.lax.stop_gradient(emb),
                               self.use_pallas)
        z_q = jnp.take(emb, idx, axis=0).reshape(z.shape)  # grads reach emb
        loss = jnp.mean((jax.lax.stop_gradient(z) - z_q) ** 2) + self.beta * jnp.mean(
            (z - jax.lax.stop_gradient(z_q)) ** 2
        )
        z_q = z + jax.lax.stop_gradient(z_q - z)
        code = idx.reshape(z.shape[:-1])
        return z_q, loss, (None, None, code)

    def get_codebook_entry(self, indices):
        emb = self.get_variable("params", "embedding")
        return jnp.take(emb, indices, axis=0)


class VectorQuantizer2(nn.Module):
    """taming VectorQuantizer2 (reference `quantize_vqgan.py:213-341`):
    gradient-trained codebook with optional post-hoc index remap.

    * ``legacy=True`` (reference default) replicates the upstream beta-on-the-
      wrong-term bug: loss = ||sg(z)-e||^2 + beta ||z-sg(e)||^2 becomes
      beta applied to the CODEBOOK term instead of the commitment term.
    * ``remap``: path to an .npy of "used" code ids; emitted indices are
      positions into that list, with unseen codes mapped to ``unknown_index``
      ("random" draws a uniform used-position — pass an "rng" stream —
      "extra" appends a dedicated id, or give an int).
    * ``sane_index_shape``: (B, H, W) indices instead of the reference's
      flattened (N, 1).
    """

    n_e: int = 1024
    e_dim: int = 256
    beta: float = 0.25
    remap: Optional[str] = None
    unknown_index: str | int = "random"
    sane_index_shape: bool = False
    legacy: bool = True
    use_pallas: Optional[bool] = None

    def _used(self):
        import numpy as np

        return jnp.asarray(np.load(self.remap))

    @property
    def re_embed(self):
        if self.remap is None:
            return self.n_e
        import numpy as np

        n_used = int(np.load(self.remap).shape[0])
        return n_used + 1 if self.unknown_index == "extra" else n_used

    def remap_to_used(self, inds):
        used = self._used()
        match = inds[..., None] == used
        new = jnp.argmax(match, axis=-1)
        unknown = ~jnp.any(match, axis=-1)
        if self.unknown_index == "random":
            rnd = jax.random.randint(
                self.make_rng("rng"), new.shape, 0, self.re_embed
            )
            fill = rnd
        elif self.unknown_index == "extra":
            fill = jnp.full_like(new, used.shape[0])
        else:
            fill = jnp.full_like(new, int(self.unknown_index))
        return jnp.where(unknown, fill, new)

    def unmap_to_all(self, inds):
        used = self._used()
        if self.re_embed > used.shape[0]:  # extra token -> 0
            inds = jnp.where(inds >= used.shape[0], 0, inds)
        return jnp.take(used, inds, axis=0)

    @nn.compact
    def __call__(self, z, temp=None, codebook_mask=None, train: bool = False, **_):
        emb = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1.0 / self.n_e, 1.0 / self.n_e
            ),
            (self.n_e, self.e_dim),
        )
        flat = z.reshape(-1, self.e_dim)
        idx, _ = nearest_codes(
            jax.lax.stop_gradient(flat), jax.lax.stop_gradient(emb), self.use_pallas
        )
        z_q = jnp.take(emb, idx, axis=0).reshape(z.shape)
        codebook_term = jnp.mean((jax.lax.stop_gradient(z) - z_q) ** 2)
        commit_term = jnp.mean((z - jax.lax.stop_gradient(z_q)) ** 2)
        if self.legacy:
            # upstream bug: beta lands on the CODEBOOK term
            # (`quantize_vqgan.py:295-297`)
            loss = commit_term + self.beta * codebook_term
        else:
            loss = self.beta * commit_term + codebook_term
        z_q = z + jax.lax.stop_gradient(z_q - z)

        code = idx.reshape(z.shape[:-1])  # (B, H, W)
        if self.remap is not None:
            code = self.remap_to_used(code)
        if not self.sane_index_shape:
            code = code.reshape(-1, 1)
        return z_q, loss, (None, None, code)

    def get_codebook_entry(self, indices, shape=None):
        if self.remap is not None:
            indices = self.unmap_to_all(indices)
        emb = self.get_variable("params", "embedding")
        z_q = jnp.take(emb, indices, axis=0)
        if shape is not None:  # reference shape = (B, H, W, C)
            z_q = z_q.reshape(shape)
        return z_q


class GumbelQuantize(nn.Module):
    """Soft gumbel-softmax quantization with KL-to-uniform regularizer
    (taming GumbelQuantize)."""

    num_hiddens: int = 256
    embedding_dim: int = 256
    n_embed: int = 1024
    kl_weight: float = 5e-4
    temp_init: float = 1.0
    straight_through: bool = True

    @nn.compact
    def __call__(self, z, temp: Optional[float] = None, train: bool = False, **_):
        hard = self.straight_through if train else True
        temp = self.temp_init if temp is None or temp == 0.0 else temp

        logits = nn.Conv(self.n_embed, (1, 1), name="proj")(z)
        emb = self.param(
            "embedding", nn.initializers.normal(1.0), (self.n_embed, self.embedding_dim)
        )
        if train:
            g = jax.random.gumbel(self.make_rng("gumbel"), logits.shape)
            soft = jax.nn.softmax((logits + g) / temp, axis=-1)
        else:
            soft = jax.nn.softmax(logits / temp, axis=-1)
        if hard:
            idx = jnp.argmax(soft, axis=-1)
            onehot = jax.nn.one_hot(idx, self.n_embed, dtype=soft.dtype)
            soft_q = onehot + soft - jax.lax.stop_gradient(soft)
        else:
            soft_q = soft
            idx = jnp.argmax(soft, axis=-1)
        z_q = jnp.einsum("bhwn,nd->bhwd", soft_q, emb)

        probs = jax.nn.softmax(logits, axis=-1)
        kl = self.kl_weight * jnp.mean(
            jnp.sum(probs * jnp.log(probs * self.n_embed + 1e-10), axis=-1)
        )
        return z_q, kl, (None, None, idx)


class EMAVectorQuantizer(nn.Module):
    """Taming-style EMA quantizer — same EMA math as the flagship masked
    quantizer minus the mask/pad row; provided for legacy config parity."""

    n_embed: int = 1024
    embedding_dim: int = 256
    beta: float = 0.25
    decay: float = 0.99
    eps: float = 1e-5

    def setup(self):
        self.inner = VectorQuantizeEMA(
            codebook_size=self.n_embed,
            codebook_dim=self.embedding_dim,
            commitment_beta=self.beta,
            decay=self.decay,
            restart_unused_codes=False,
            eps=self.eps,
        )

    def __call__(self, z, train: bool = False, **_):
        return self.inner(z, train=train)

    def get_codebook_entry(self, indices):
        return self.inner.get_codebook_entry(indices)


class RQBottleneck(nn.Module):
    """Residual quantization of depth D (reference `quantize_rqvae.py:149`):
    quantize z, subtract, quantize the residual, ... ; output is the sum of
    the selected codes, codes shape (B, H, W, D)."""

    latent_shape: Sequence[int] = (8, 8, 256)
    code_shape: Sequence[int] = (8, 8, 4)
    n_embed: int = 1024
    decay: float = 0.99
    shared_codebook: bool = True
    restart_unused_codes: bool = True
    commitment_loss: str = "cumsum"
    use_pallas: Optional[bool] = None

    def setup(self):
        depth = self.code_shape[-1]
        dim = self.latent_shape[-1]
        make = lambda name: VectorQuantizeEMA(
            codebook_size=self.n_embed,
            codebook_dim=dim,
            decay=self.decay,
            restart_unused_codes=self.restart_unused_codes,
            use_pallas=self.use_pallas,
            name=name,
        )
        if self.shared_codebook:
            shared = make("codebook_shared")
            self.codebooks = [shared] * depth
        else:
            self.codebooks = [make(f"codebook_{d}") for d in range(depth)]

    def __call__(self, z, train: bool = False, **_):
        depth = self.code_shape[-1]
        residual = z
        cumsum_raw = jnp.zeros_like(z)
        codes = []
        commit = 0.0
        for d in range(depth):
            q_st, _, (_, _, code) = self.codebooks[d](residual, train=train)
            q_raw = jax.lax.stop_gradient(q_st)
            residual = residual - q_raw
            cumsum_raw = cumsum_raw + q_raw
            codes.append(code)
            # cumulative commitment: ||z - sg(sum_{<=d} q)||^2 at every depth
            commit = commit + jnp.mean((z - cumsum_raw) ** 2)
        commit = commit / depth
        # one straight-through for the aggregate
        out = z + (cumsum_raw - jax.lax.stop_gradient(z))
        codes = jnp.stack(codes, axis=-1)  # (B, H, W, D)
        return out, commit, (None, None, codes)

    def get_codebook_entry(self, codes):
        """codes: (B, H, W, D) -> summed embeddings (B, H, W, dim)."""
        out = 0.0
        for d in range(self.code_shape[-1]):
            out = out + self.codebooks[d].get_codebook_entry(codes[..., d])
        return out


class MaskVectorQuantize(nn.Module):
    """Gradient-trained masked quantizer (reference
    `modules/vector_quantization/quantize_codebook_mask.py:15-185`), the
    commented-out alternative VQ target in
    `configs/stage1/dqvae-entropy-dual-r05_imagenet.yml:66`.

    Semantics vs the flagship EMA quantizer (`ops/vq.VectorQuantizeEMA`):

      * the codebook is an ordinary *parameter* trained by the AE optimizer
        through the codebook-side loss term `mean((x_q - sg(x))^2 * mask)`
        (reference `:118-121`) — no EMA buffers, no restarts;
      * optional kmeans codebook init from the first batch's features
        (reference `init_embed_` + `initted` buffer, `:57-75`) — realized
        flax-natively like ActNorm DDI: the param initializer closes over the
        init-time input, so `model.init(rng, sample_batch)` IS the "first
        forward" that seeds the codebook;
      * optional cosine-similarity code selection (`:98-104`);
      * gumbel-sampled assignment at temp > 0 (`utils.gumbel_sample`, rng
        collection "vq");
      * masked commitment scaled by `ratio = 1/mean(mask)` (`:116-118`);
      * orthogonal regularizer, eq (2) of arXiv:2112.00384 (`:123-130`).
    """

    codebook_size: int = 1024
    codebook_dim: int = 256
    kmeans_init: bool = False
    kmeans_iters: int = 10
    use_cosine_sim: bool = False
    commitment_beta: float = 0.25
    orthogonal_reg_weight: float = 0.0
    activate_mask_quantize: bool = True
    accept_image_fmap: bool = True

    @nn.compact
    def __call__(self, x, codebook_mask=None, temp=0.0, train: bool = False, **_):
        from .quantize_lucidrains import _l2norm, kmeans

        d = x.shape[-1]
        assert d == self.codebook_dim, (x.shape, self.codebook_dim)
        flat = x.reshape(-1, d)

        def init_embed(rng):
            if self.kmeans_init:
                return kmeans(
                    rng,
                    jax.lax.stop_gradient(flat),
                    self.codebook_size,
                    self.kmeans_iters,
                    use_cosine=self.use_cosine_sim,
                )
            return jax.random.uniform(
                rng,
                (self.codebook_size, d),
                jnp.float32,
                -1.0 / self.codebook_size,
                1.0 / self.codebook_size,
            )

        emb = self.param("embedding", init_embed)

        if self.use_cosine_sim:
            # similarity (higher = closer), reference `:98-104`
            dist = _l2norm(jax.lax.stop_gradient(flat)) @ _l2norm(
                jax.lax.stop_gradient(emb)
            ).T
        else:
            f = jax.lax.stop_gradient(flat)
            e = jax.lax.stop_gradient(emb)
            dist = (
                -jnp.sum(f**2, axis=1, keepdims=True)
                - jnp.sum(e**2, axis=1)[None]
                + 2.0 * f @ e.T
            )
        if temp > 0 and train:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(self.make_rng("vq"), dist.shape, minval=1e-9,
                                   maxval=1.0 - 1e-9)
            ))
            idx = jnp.argmax(dist / temp + g, axis=-1)
        else:
            idx = jnp.argmax(dist, axis=-1)

        x_q = jnp.take(emb, idx, axis=0).reshape(x.shape)  # grads reach emb

        if codebook_mask is not None and self.activate_mask_quantize:
            mask = codebook_mask.reshape(x.shape[:-1] + (1,)).astype(x.dtype)
            ratio = 1.0 / jnp.mean(mask)
            loss = ratio * self.commitment_beta * jnp.mean(
                (jax.lax.stop_gradient(x_q) - x) ** 2 * mask
            ) + ratio * jnp.mean((x_q - jax.lax.stop_gradient(x)) ** 2 * mask)
        else:
            loss = self.commitment_beta * jnp.mean(
                (jax.lax.stop_gradient(x_q) - x) ** 2
            ) + jnp.mean((x_q - jax.lax.stop_gradient(x)) ** 2)

        if self.orthogonal_reg_weight > 0.0:
            en = _l2norm(emb)
            diff = en @ en.T - jnp.eye(self.codebook_size, dtype=en.dtype)
            loss = loss + self.orthogonal_reg_weight * jnp.sum(diff**2) / (
                self.codebook_size**2
            )

        x_q = x + jax.lax.stop_gradient(x_q - x)
        code = idx.reshape(x.shape[:-1])
        return x_q, loss, (None, None, code)

    def get_codebook_entry(self, indices):
        emb = self.get_variable("params", "embedding")
        return jnp.take(emb, indices, axis=0)

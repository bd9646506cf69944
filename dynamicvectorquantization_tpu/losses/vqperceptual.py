"""VQ-GAN objective: L1 + LPIPS + hinge/vanilla/bce GAN with adaptive
discriminator weight, codebook loss, and optional budget loss.

Reference: `modules/losses/vqperceptual_multidisc.py:47-194`. The adaptive
weight `||grad nll|| / (||grad g|| + 1e-4)` w.r.t. the decoder's LAST conv
kernel (`:102-113`) is computed in the train step (`train/stage1.py`) with a
single jax.vjp through this module's `nll_and_g` — one extra forward, two
cheap pullbacks, instead of torch's retain_graph double-backward.

This flax module owns the LPIPS net and the discriminator (the reference
keeps them as loss attributes too); the discriminator is optimized separately
(optimizer_idx 1).
"""
from __future__ import annotations

from typing import Any, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.instantiate import instantiate_from_config


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    return jnp.where(global_step < threshold, value, weight)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def hinge_g_loss(logits_fake):
    return -jnp.mean(logits_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake))
    )


def _log(t, eps=1e-10):
    return jnp.log(t + eps)


def bce_d_loss(logits_real, logits_fake):
    return jnp.mean(
        -_log(1 - jax.nn.sigmoid(logits_fake)) - _log(jax.nn.sigmoid(logits_real))
    )


def bce_g_loss(logits_fake):
    return -jnp.mean(_log(jax.nn.sigmoid(logits_fake)))


class DummyLoss:
    """No-op loss placeholder used when the DQ-VAE is frozen inside stage 2
    (reference `modules/losses/vqperceptual.py:9`)."""

    def __init__(self, *args, **kwargs):
        pass


class VQLPIPSWithDiscriminator(nn.Module):
    disc_start: int = 0
    disc_config: Optional[Mapping[str, Any]] = None
    disc_init: bool = True
    codebook_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_conditional: bool = False
    disc_adaptive_loss: bool = True
    disc_loss: str = "hinge"
    disc_weight_max: Optional[float] = None
    budget_loss_config: Optional[Mapping[str, Any]] = None

    def setup(self):
        assert self.disc_loss in ("hinge", "vanilla", "bce")
        from ..nn.lpips import LPIPS

        self.perceptual_loss = LPIPS(name="perceptual_loss")
        self.discriminator = instantiate_from_config(self.disc_config)
        if self.budget_loss_config is not None:
            self.budget_loss = instantiate_from_config(self.budget_loss_config)
        else:
            self.budget_loss = None
        self._d_loss = {"hinge": hinge_d_loss, "vanilla": vanilla_d_loss, "bce": bce_d_loss}[
            self.disc_loss
        ]
        self._g_loss = {"hinge": hinge_g_loss, "vanilla": hinge_g_loss, "bce": bce_g_loss}[
            self.disc_loss
        ]

    # --- pieces composed by the train step ---
    def nll(self, inputs, reconstructions):
        """L1 + perceptual, reduced to scalar + logging parts
        (reference `:116-124`)."""
        rec = jnp.abs(inputs - reconstructions)
        if self.perceptual_weight > 0:
            p = self.perceptual_loss(inputs, reconstructions)
            rec_full = rec + self.perceptual_weight * p
            p_mean = jnp.mean(p)
        else:
            rec_full = rec
            p_mean = jnp.asarray(0.0)
        return jnp.mean(rec_full), jnp.mean(rec_full), p_mean

    def g_loss(self, reconstructions, cond=None, train: bool = False):
        if cond is None:
            logits_fake = self.discriminator(reconstructions, train=train)
        else:
            logits_fake = self.discriminator(
                jnp.concatenate([reconstructions, cond], axis=-1), train=train
            )
        return self._g_loss(logits_fake)

    def nll_and_g(self, inputs, reconstructions, cond=None, train: bool = False):
        """One forward yielding both adaptive-weight targets (for jax.vjp)."""
        nll_loss, _, _ = self.nll(inputs, reconstructions)
        g = self.g_loss(reconstructions, cond, train=train)
        return nll_loss, g

    def d_loss(self, inputs, reconstructions, global_step, cond=None, train: bool = False):
        """Discriminator objective on detached recon (reference `:178-194`)."""
        inputs = jax.lax.stop_gradient(inputs)
        reconstructions = jax.lax.stop_gradient(reconstructions)
        if cond is None:
            logits_real = self.discriminator(inputs, train=train)
            logits_fake = self.discriminator(reconstructions, train=train)
        else:
            logits_real = self.discriminator(
                jnp.concatenate([inputs, cond], axis=-1), train=train
            )
            logits_fake = self.discriminator(
                jnp.concatenate([reconstructions, cond], axis=-1), train=train
            )
        disc_factor = adopt_weight(
            self.disc_factor, global_step, threshold=self.disc_start
        )
        d = disc_factor * self._d_loss(logits_real, logits_fake)
        return d, {
            "disc_loss": d,
            "logits_real": jnp.mean(logits_real),
            "logits_fake": jnp.mean(logits_fake),
        }

    def budget(self, gate):
        if self.budget_loss is None:
            return jnp.asarray(0.0)
        return self.budget_loss(gate)

    def __call__(self, inputs, reconstructions, cond=None, train: bool = False):
        """Parameter-initialization entry point (touches every submodule)."""
        nll_loss, rec, p = self.nll(inputs, reconstructions)
        g = self.g_loss(reconstructions, cond, train=train)
        d, _ = self.d_loss(inputs, reconstructions, jnp.asarray(0), cond, train=train)
        return nll_loss + 0.0 * (g + d)

"""Stage-1 (DQ-VAE + GAN) training: a single jitted two-optimizer step.

Reproduces the reference's alternating Lightning optimization
(`models/stage1_dynamic/dqvae_dual_entropy.py:154-183,206-236`):

  * optimizer 0 (AE): Adam(0.5, 0.9) over encoder/decoder/quant convs; loss =
    L1 + LPIPS + adaptive-weighted hinge G-loss + codebook loss (+ budget);
  * optimizer 1 (disc): Adam(0.5, 0.9) over the discriminator; hinge D-loss on
    a freshly decoded reconstruction (the reference recomputes the forward for
    the disc pass with the just-updated AE — replicated here);
  * the VQ codebook updates by EMA inside the AE forward;
  * adaptive disc weight = ||dnll/dW|| / ||dg/dW|| for the decoder's last conv
    kernel W (`vqperceptual_multidisc.py:102-113`), via one jax.vjp through
    the loss head on `conv(stop_grad(pre_out), W)`.

Distribution: the step is one SPMD program — jit it with the batch sharded
over the mesh's "dp" axis and state replicated (`parallel/mesh.py`); XLA
inserts the gradient/EMA all-reduces over ICI.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .schedules import make_schedule


class Stage1State(NamedTuple):
    ae_params: Any
    ae_opt: Any
    ema: Any  # VQ codebook EMA collection
    loss_params: Any  # LPIPS + discriminator params
    loss_stats: Any  # discriminator BatchNorm batch_stats
    disc_opt: Any
    step: jnp.ndarray
    epoch: jnp.ndarray


def _conv_same(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


class Stage1Trainer:
    """Builds optimizers + the jitted train/eval steps for a DQ-VAE bundle."""

    def __init__(self, model, learning_rate, min_learning_rate=0.0,
                 warmup_steps=0, max_steps=1_000_000, scheduler_type=None,
                 remat=None, accum=1):
        self.model = model
        self.net = model.net
        self.loss = model.loss
        # Gradient accumulation (reference train.py `accumulate_grad_batches`,
        # fed to Lightning). accum>1: train_step takes x of shape
        # (accum, B, ...) and scans microbatches, averaging grads; each
        # optimizer updates once per step. EMA / batch_stats evolve per
        # microbatch (Lightning calls training_step per batch).
        self.accum = int(accum)
        assert self.accum >= 1
        # remat rematerializes the AE forward during backward (keeps only
        # matmul outputs). On TPU at 256^2 production geometry this is not a
        # tradeoff but a requirement: measured 33.2 img/s/chip WITH remat vs
        # 1.27 without (activation memory pressure). Default: on for TPU.
        if remat is None:
            import jax as _jax

            remat = _jax.default_backend() == "tpu"
        self.remat = remat
        sched_type = scheduler_type or model.scheduler_type
        self.ae_schedule = make_schedule(
            sched_type, learning_rate, warmup_steps, max_steps, min_learning_rate
        )
        self.disc_schedule = make_schedule(
            sched_type, learning_rate, warmup_steps, max_steps, min_learning_rate
        )
        # reference: Adam(betas=(0.5, 0.9)) for both optimizers
        self.ae_tx = optax.adam(self.ae_schedule, b1=0.5, b2=0.9)
        self.disc_tx = optax.adam(self.disc_schedule, b1=0.5, b2=0.9)
        self.loss_with_epoch = getattr(model, "loss_with_epoch", True)

    # ----------------------------------------------------------------- init
    def init_state(self, rng, sample_batch=None, lpips_vgg_path=None,
                   lpips_lin_path=None) -> Stage1State:
        import os

        net_vars = self.model.init(rng, sample_batch)
        x = (
            sample_batch
            if sample_batch is not None
            else jnp.zeros((1, self.model.image_size, self.model.image_size, 3))
        )
        loss_vars = self.loss.init(
            {"params": jax.random.fold_in(rng, 7)}, x, x, train=False
        )
        # LPIPS weights. The reference's learned lin heads (its
        # `modules/lpips/vgg.pth`, md5-pinned at `utils/utils.py:236-244`) ship
        # with this package (assets/lpips/vgg_lin.npz) and load by default.
        # The torchvision VGG16 backbone cannot be bundled (license/size):
        # point DQVQ_LPIPS_VGG at its state_dict for full LPIPS parity;
        # without it the backbone uses seeded random features (see
        # nn/lpips.py docstring).
        lpips_vgg_path = lpips_vgg_path or os.environ.get("DQVQ_LPIPS_VGG")
        lpips_lin_path = lpips_lin_path or os.environ.get("DQVQ_LPIPS_LIN")
        merged = dict(loss_vars["params"]["perceptual_loss"])
        if lpips_vgg_path or lpips_lin_path:
            from ..utils.torch_ckpt import convert_lpips_weights, load_torch_state_dict

            vgg_sd = load_torch_state_dict(lpips_vgg_path) if lpips_vgg_path else None
            lin_sd = load_torch_state_dict(lpips_lin_path) if lpips_lin_path else None
            lpips_params = convert_lpips_weights(vgg_sd, lin_sd)
            for k, v in lpips_params.items():
                if k == "net" and vgg_sd is not None:
                    merged["net"] = v
                elif k != "net":
                    merged[k] = v
        if not lpips_lin_path:
            from ..nn.lpips import load_bundled_lin_heads

            for k, v in load_bundled_lin_heads().items():
                merged[k] = v
        loss_vars = {
            **loss_vars,
            "params": {**loss_vars["params"], "perceptual_loss": merged},
        }
        disc_params = loss_vars["params"]["discriminator"]
        return Stage1State(
            ae_params=net_vars["params"],
            ae_opt=self.ae_tx.init(net_vars["params"]),
            # plain-param quantizers (legacy VectorQuantizer) have no ema
            # collection; an empty one is inert through apply()
            ema=net_vars.get("ema", {}),
            loss_params=loss_vars["params"],
            loss_stats=loss_vars.get("batch_stats", {}),
            disc_opt=self.disc_tx.init(loss_vars["params"]["discriminator"]),
            step=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------ train step
    @staticmethod
    def _make_rngs(rng):
        return {
            "gumbel": jax.random.fold_in(rng, 0),
            "vq": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2),
        }

    def train_step(self, state: Stage1State, x, rng):
        """One AE update + one disc update.

        x: (B, H, W, C), or (accum, B, H, W, C) when accum > 1 — grads are
        averaged over the microbatches and each optimizer steps once.
        """
        gate_step = state.epoch if self.loss_with_epoch else state.step

        # ---------------- optimizer 0: autoencoder ----------------
        def ae_loss_fn(ae_params, ema, loss_stats, x, rngs):
            loss_vars = {"params": state.loss_params}
            if loss_stats:
                loss_vars["batch_stats"] = loss_stats
            net_vars = {"params": ae_params, "ema": ema}

            def fwd(net_vars, x):
                return self.net.apply(
                    net_vars, x, train=True, return_pre_out=True,
                    rngs=rngs, mutable=["ema"],
                )

            if self.remat:
                fwd = jax.checkpoint(
                    fwd,
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                )
            (out, mut) = fwd(net_vars, x)
            (xrec, pre_out), qloss, grain_indices, gate, _ = out
            nll_loss, rec_loss, p_loss = self.loss.apply(
                loss_vars, x, xrec, method="nll"
            )
            g_loss, gmut = self.loss.apply(
                loss_vars, xrec, train=True, method="g_loss",
                mutable=["batch_stats"],
            )

            # adaptive disc weight via VJP through the last conv only
            w_last = ae_params["decoder"]["conv_out"]["kernel"]
            b_last = ae_params["decoder"]["conv_out"]["bias"]
            pre_sg = jax.lax.stop_gradient(pre_out)

            if self.loss.disc_adaptive_loss:
                def head(w):
                    xr = _conv_same(pre_sg, w, b_last)
                    return self.loss.apply(loss_vars, x, xr, method="nll_and_g")

                _, pull = jax.vjp(head, w_last)
                (g_nll,) = pull((jnp.ones(()), jnp.zeros(())))
                (g_g,) = pull((jnp.zeros(()), jnp.ones(())))
                d_weight = jnp.linalg.norm(g_nll.reshape(-1)) / (
                    jnp.linalg.norm(g_g.reshape(-1)) + 1e-4
                )
                d_weight = jax.lax.stop_gradient(jnp.clip(d_weight, 0.0, 1e4))
                d_weight = d_weight * self.loss.disc_weight
                if self.loss.disc_weight_max is not None:
                    d_weight = jnp.minimum(d_weight, self.loss.disc_weight_max)
            else:
                d_weight = jnp.asarray(self.loss.disc_weight_max)

            disc_factor = jnp.where(
                gate_step < self.loss.disc_start, 0.0, self.loss.disc_factor
            )
            budget = self.loss.apply(loss_vars, gate, method="budget")
            total = (
                nll_loss
                + d_weight * disc_factor * g_loss
                + self.loss.codebook_weight * qloss
                + budget
            )
            log_ratios = {}
            if grain_indices is not None:
                g = grain_indices.astype(jnp.float32)
                if gate is not None and gate.shape[-1] == 3:
                    # triple grain: reference logs fine (==2) and median (==1)
                    # ratios separately (dqvae_triple_feat.py:102-136)
                    log_ratios["train_fine_ratio"] = jnp.mean(g == 2)
                    log_ratios["train_median_ratio"] = jnp.mean(g == 1)
                else:
                    log_ratios["train_fine_ratio"] = jnp.mean(g > 0)
            aux = {
                "ema": mut["ema"],
                "batch_stats": gmut.get("batch_stats", loss_stats),
                "log": {
                    **log_ratios,
                    "train_aeloss": total,
                    "train_rec_loss": rec_loss,
                    "train_nll_loss": nll_loss,
                    "train_p_loss": p_loss,
                    "train_quant_loss": qloss,
                    "train_g_loss": g_loss,
                    "train_d_weight": d_weight,
                    "train_disc_factor": disc_factor,
                    "train_budget_loss": budget,
                },
            }
            return total, aux

        ae_grad_fn = jax.value_and_grad(ae_loss_fn, has_aux=True)

        if self.accum == 1:
            (_, aux), ae_grads = ae_grad_fn(
                state.ae_params, state.ema, state.loss_stats, x,
                self._make_rngs(rng),
            )
            ema, loss_stats, ae_log = aux["ema"], aux["batch_stats"], aux["log"]
        else:
            micro_rngs = jax.random.split(rng, self.accum)
            (_, aux0), g0 = ae_grad_fn(
                state.ae_params, state.ema, state.loss_stats, x[0],
                self._make_rngs(micro_rngs[0]),
            )

            def ae_micro(carry, inp):
                ema, loss_stats, gsum, logsum = carry
                xi, ri = inp
                (_, aux), g = ae_grad_fn(
                    state.ae_params, ema, loss_stats, xi, self._make_rngs(ri)
                )
                return (
                    aux["ema"],
                    aux["batch_stats"],
                    jax.tree.map(jnp.add, gsum, g),
                    jax.tree.map(jnp.add, logsum, aux["log"]),
                ), None

            (ema, loss_stats, gsum, logsum), _ = jax.lax.scan(
                ae_micro,
                (aux0["ema"], aux0["batch_stats"], g0, aux0["log"]),
                (x[1:], micro_rngs[1:]),
            )
            inv = 1.0 / self.accum
            ae_grads = jax.tree.map(lambda t: t * inv, gsum)
            ae_log = jax.tree.map(lambda t: t * inv, logsum)

        ae_updates, ae_opt = self.ae_tx.update(ae_grads, state.ae_opt, state.ae_params)
        ae_params = optax.apply_updates(state.ae_params, ae_updates)

        # ---------------- optimizer 1: discriminator ----------------
        # fresh forward with the UPDATED AE (Lightning per-optimizer forward);
        # its ema mutation is discarded — QUIRKS #15/#20.
        def d_loss_fn(disc_params, loss_stats, x, xrec2):
            lp = {**state.loss_params, "discriminator": disc_params}
            lv = {"params": lp}
            if loss_stats:
                lv["batch_stats"] = loss_stats
            (d, dlog), dmut = self.loss.apply(
                lv, x, xrec2, gate_step, train=True, method="d_loss",
                mutable=["batch_stats"],
            )
            return d, (dlog, dmut.get("batch_stats", loss_stats))

        d_grad_fn = jax.value_and_grad(d_loss_fn, has_aux=True)
        net_vars = {"params": ae_params, "ema": ema}

        def _fresh_rec(xi, ri):
            (xrec2, *_), _ = self.net.apply(
                net_vars, xi, train=True, rngs=self._make_rngs(ri),
                mutable=["ema"],
            )
            return jax.lax.stop_gradient(xrec2)

        if self.accum == 1:
            (_, (dlog, loss_stats)), d_grads = d_grad_fn(
                state.loss_params["discriminator"], loss_stats, x,
                _fresh_rec(x, rng),
            )
        else:
            (_, (dlog0, stats0)), dg0 = d_grad_fn(
                state.loss_params["discriminator"], loss_stats, x[0],
                _fresh_rec(x[0], micro_rngs[0]),
            )

            def d_micro(carry, inp):
                loss_stats, gsum, logsum = carry
                xi, ri = inp
                (_, (dlog, new_stats)), g = d_grad_fn(
                    state.loss_params["discriminator"], loss_stats, xi,
                    _fresh_rec(xi, ri),
                )
                return (
                    new_stats,
                    jax.tree.map(jnp.add, gsum, g),
                    jax.tree.map(jnp.add, logsum, dlog),
                ), None

            (loss_stats, dgsum, dlogsum), _ = jax.lax.scan(
                d_micro, (stats0, dg0, dlog0), (x[1:], micro_rngs[1:])
            )
            d_grads = jax.tree.map(lambda t: t * inv, dgsum)
            dlog = jax.tree.map(lambda t: t * inv, dlogsum)
        d_updates, disc_opt = self.disc_tx.update(
            d_grads, state.disc_opt, state.loss_params["discriminator"]
        )
        disc_params = optax.apply_updates(
            state.loss_params["discriminator"], d_updates
        )
        loss_params = {**state.loss_params, "discriminator": disc_params}

        logs = dict(ae_log)
        logs.update({f"train_{k}": v for k, v in dlog.items()})

        new_state = Stage1State(
            ae_params=ae_params,
            ae_opt=ae_opt,
            ema=ema,
            loss_params=loss_params,
            loss_stats=loss_stats,
            disc_opt=disc_opt,
            step=state.step + 1,
            epoch=state.epoch,
        )
        return new_state, logs

    # -------------------------------------------------------------- eval step
    def train_steps(self, state: Stage1State, xs, rng):
        """K full GAN steps (AE + disc optimizers) in ONE compiled program.

        xs: (K, B, H, W, C) (or (K, accum, B, ...) with accum > 1).
        Semantically identical to K sequential `train_step` calls; one
        dispatch per K steps amortizes the per-dispatch host overhead
        (same rationale as Stage2Trainer.train_steps). Returns per-step
        stacked logs."""
        k = xs.shape[0]
        rs = jax.random.split(rng, k)

        def body(s, inp):
            xi, ri = inp
            return self.train_step(s, xi, ri)

        return jax.lax.scan(body, state, (xs, rs))

    def eval_step(self, state: Stage1State, x):
        net_vars = {"params": state.ae_params, "ema": state.ema}
        xrec, qloss, grain_indices, gate, _ = self.net.apply(net_vars, x)
        loss_vars = {"params": state.loss_params}
        if state.loss_stats:
            loss_vars["batch_stats"] = state.loss_stats
        nll_loss, rec_loss, p_loss = self.loss.apply(loss_vars, x, xrec, method="nll")
        out = {
            "val_rec_loss": rec_loss,
            "val_nll_loss": nll_loss,
            "val_p_loss": p_loss,
            "val_quant_loss": qloss,
        }
        if grain_indices is not None:
            g = grain_indices.astype(jnp.float32)
            if gate is not None and gate.shape[-1] == 3:
                out["val_fine_ratio"] = jnp.mean(g == 2)
                out["val_median_ratio"] = jnp.mean(g == 1)
            else:
                out["val_fine_ratio"] = jnp.mean(g > 0)
        return out

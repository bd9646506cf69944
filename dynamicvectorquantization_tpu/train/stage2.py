"""Stage-2 (DQ-Transformer) training step.

Reference: `models/stage2_dynamic/dqtransformer_uncond_entropy.py:92-143,
222-248` — AdamW(0.9, 0.95) with a decay/no-decay split (Linear kernels decay;
biases, LayerNorm, Embeddings, and the absolute `pos_emb` don't), warmup +
cosine LR, frozen first stage, total = content_loss_weight * content +
position_loss_weight * position.

Torch parity detail: nn.Embedding(padding_idx=...) zeroes the pad row's
gradient every step. Replicated via a gradient mask on the three embedding
tables' pad rows.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .schedules import warmup_cosine


class Stage2State(NamedTuple):
    params: Any  # transformer params
    opt: Any
    step: jnp.ndarray
    epoch: jnp.ndarray


def _decay_mask(params):
    """True (decay) for Dense kernels; False for everything else
    (biases, LayerNorm scale/bias, embedding tables, pos_emb)."""

    def mask(path, leaf):
        leaf_name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return leaf_name == "kernel"

    return jax.tree_util.tree_map_with_path(mask, params)


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        tree,
    )


class Stage2Trainer:
    def __init__(self, model, learning_rate, min_learning_rate=0.0,
                 warmup_steps=0, max_steps=1_000_000, accum=1,
                 compute_dtype=None, dropout_prng_impl="rbg",
                 fused_adamw=None):
        self.model = model
        # mixed precision (TPU-native; the reference trains f32): forward /
        # backward in `compute_dtype` (bf16) against f32 master params —
        # the cast's transpose returns f32 grads, AdamW state stays f32.
        # Cross-entropies always reduce in f32 (stackgpt.cross_entropy_ignore).
        self.compute_dtype = (
            jnp.dtype(compute_dtype) if compute_dtype not in (None, "float32")
            else None
        )
        # Dropout PRNG: attn_pdrop=0.1 needs a (B, H, T, T) mask per layer —
        # ~1e9 random samples per step at p6c18 geometry. jax's default
        # threefry PRNG generates these on the VPU and dominated the train
        # step; "rbg" uses the hardware RNG (still deterministic per key).
        # Pattern identity vs the reference is meaningless for dropout, so
        # this is not a parity deviation. Set "threefry" to keep the default.
        self.dropout_prng_impl = dropout_prng_impl
        # accum>1: train_step takes (accum, B, ...) microbatches, averages
        # grads, one optimizer update (reference `accumulate_grad_batches`).
        self.accum = int(accum)
        assert self.accum >= 1
        self.schedule = warmup_cosine(
            learning_rate, warmup_steps, max_steps,
            min_learning_rate / max(learning_rate, 1e-20),
        )
        self.tx = optax.adamw(
            self.schedule,
            b1=0.9,
            b2=0.95,
            weight_decay=model.weight_decay,
            mask=_decay_mask,
        )
        # Fused single-pass Pallas AdamW (ops/fused_adamw.py): same math and
        # opt-state pytree as the optax chain above (checkpoints stay
        # interchangeable; equivalence tested), but one HBM read+write of
        # (p, m, v) per step instead of the chain's many materialized passes
        # — the profiled optimizer share of the p6c18 step was ~54 ms/191 ms.
        # Default: on for TPU, off elsewhere (interpret mode is test-only).
        if fused_adamw is None:
            fused_adamw = jax.default_backend() == "tpu"
        self.fused_adamw = bool(fused_adamw)
        t = model.transformer
        self._pad_rows = {
            "content_emb": t.content_pad_code,
            "content_coarse_pos_emb": t.coarse_position_pad_code,
            "content_fine_pos_emb": t.fine_position_pad_code,
        }

    def init_state(self, variables) -> Stage2State:
        params = variables["transformer"]["params"]
        return Stage2State(
            params=params,
            opt=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
        )

    def _freeze_pad_rows(self, grads):
        for table, pad in self._pad_rows.items():
            if table in grads:
                g = grads[table]["embedding"]
                grads = {
                    **grads,
                    table: {"embedding": g.at[pad].set(0.0)},
                }
        return grads

    def train_step(self, state: Stage2State, variables, x, c, rng):
        """variables carries the frozen first stage + transformer non-params.

        x (and c when conditional): (B, ...) or (accum, B, ...) microbatches.
        """
        params_c = (
            _cast_tree(state.params, self.compute_dtype)
            if self.compute_dtype is not None else state.params
        )
        new_state, logs, _ = self._step(state, variables, x, c, rng, params_c)
        return new_state, logs

    def _step(self, state: Stage2State, variables, x, c, rng, params_c):
        """One optimizer step given `params_c`, the compute-dtype working
        copy of state.params (== state.params when compute_dtype is None).

        Differentiates w.r.t. the WORKING COPY — value-identical to casting
        inside the loss (the cast VJP is an exact upcast) but removes the
        bf16->f32 grad-cast pass, and the fused AdamW kernel emits the NEXT
        step's working copy in its own single pass (`param_copy_dtype`), so
        `train_steps` does zero standalone param-cast passes after the first.
        Returns (new_state, logs, new_params_c).
        """

        fs_vars = variables["first_stage"]
        if self.compute_dtype is not None:
            fs_vars = _cast_tree(fs_vars, self.compute_dtype)

        if self.dropout_prng_impl != "threefry":
            # re-seed the dropout stream on the fast PRNG (see __init__)
            rng = jax.random.key(
                jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max),
                impl=self.dropout_prng_impl,
            )

        def loss_fn(params, xi, ci, ri):
            if self.compute_dtype is not None:
                if not isinstance(xi, dict):
                    xi = xi.astype(self.compute_dtype)
            v = {
                "transformer": {**variables["transformer"], "params": params},
                "first_stage": fs_vars,
            }
            if isinstance(xi, dict):  # cached permuter streams (ints)
                out = self.model.forward_tokens(v, xi, ci, train=True,
                                                rngs={"dropout": ri})
            else:
                out = self.model.forward(v, xi, ci, train=True,
                                         rngs={"dropout": ri})
            total = self.model.loss(out)
            return total, out

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if isinstance(x, dict):
            assert self.accum == 1, "cached-codes mode supports accum=1"
        if self.accum == 1:
            (total, out), grads = grad_fn(params_c, x, c, rng)
            log_src = {"total": total, **out}
        else:
            # accumulate in f32 regardless of the grad dtype (the per-micro
            # upcast is exactly what the in-loss cast's VJP used to do)
            as_f32 = lambda g: jax.tree.map(
                lambda t: t.astype(jnp.float32), g)
            rs = jax.random.split(rng, self.accum)
            c0 = None if c is None else c[0]
            (t0, out0), g0 = grad_fn(params_c, x[0], c0, rs[0])
            g0 = as_f32(g0)

            def micro(carry, inp):
                gsum, logsum = carry
                if c is None:
                    xi, ri = inp
                    ci = None
                else:
                    xi, ci, ri = inp
                (t, out), g = grad_fn(params_c, xi, ci, ri)
                return (
                    jax.tree.map(jnp.add, gsum, as_f32(g)),
                    jax.tree.map(jnp.add, logsum, {"total": t, **out}),
                ), None

            xs = (x[1:], rs[1:]) if c is None else (x[1:], c[1:], rs[1:])
            (gsum, logsum), _ = jax.lax.scan(
                micro, (g0, {"total": t0, **out0}), xs
            )
            inv = 1.0 / self.accum
            grads = jax.tree.map(lambda t: t * inv, gsum)
            log_src = jax.tree.map(lambda t: t * inv, logsum)

        grads = self._freeze_pad_rows(grads)
        new_params_c = None
        if self.fused_adamw:
            from ..ops.fused_adamw import fused_adamw_apply

            out = fused_adamw_apply(
                grads, state.opt, state.params, self.schedule,
                b1=0.9, b2=0.95, weight_decay=self.model.weight_decay,
                mask=_decay_mask,
                interpret=jax.default_backend() != "tpu",
                param_copy_dtype=self.compute_dtype,
            )
            if self.compute_dtype is not None:
                params, new_params_c, opt = out
            else:
                params, opt = out
        else:
            grads = jax.tree.map(lambda t: t.astype(jnp.float32), grads)
            updates, opt = self.tx.update(grads, state.opt, state.params)
            params = optax.apply_updates(state.params, updates)
            if self.compute_dtype is not None:
                new_params_c = _cast_tree(params, self.compute_dtype)
        if new_params_c is None:
            new_params_c = params
        logs = {
            "train_loss": log_src["total"],
            "train_content_loss": log_src["content_loss"],
            "train_position_loss": log_src["position_loss"],
            "train_coarse_position_loss": log_src["coarse_position_loss"],
            "train_fine_position_loss": log_src["fine_position_loss"],
        }
        new_state = Stage2State(params, opt, state.step + 1, state.epoch)
        return new_state, logs, new_params_c

    def train_steps(self, state: Stage2State, variables, xs, cs, rng):
        """K full optimizer steps in ONE compiled program (lax.scan).

        xs (and cs when conditional): (K, B, ...). Semantically identical to
        K sequential `train_step` calls (the optimizer runs every step,
        unlike accum microbatching); returns per-step stacked logs. Amortizes
        the per-dispatch host overhead — one dispatch per K steps.
        """
        k = jax.tree_util.tree_leaves(xs)[0].shape[0]
        rs = jax.random.split(rng, k)
        params_c0 = (
            _cast_tree(state.params, self.compute_dtype)
            if self.compute_dtype is not None else state.params
        )

        def body(carry, inp):
            s, pc = carry
            if cs is None:
                xi, ri = inp
                ci = xi
            else:
                xi, ci, ri = inp
            # _step's fused AdamW emits the next iteration's working copy
            # in-kernel — no standalone cast pass inside the scan
            s, logs, pc = self._step(s, variables, xi, ci, ri, pc)
            return (s, pc), logs

        ins = (xs, rs) if cs is None else (xs, cs, rs)
        (state, _), logs = jax.lax.scan(body, (state, params_c0), ins)
        return state, logs

    def make_encode_fn(self, variables):
        """Jitted frozen-encode: images (B, H, W, 3) -> permuter stream dict
        (the cached-codes pre-encode pass; same compute_dtype casts as the
        inline train-step encode, so cached == inline losses)."""
        fs_vars = variables["first_stage"]
        if self.compute_dtype is not None:
            fs_vars = _cast_tree(fs_vars, self.compute_dtype)
        v = {"transformer": variables["transformer"], "first_stage": fs_vars}

        @jax.jit
        def enc(x):
            if self.compute_dtype is not None:
                x = x.astype(self.compute_dtype)
            _, z = self.model.encode_to_z(v, x)
            return z

        return enc

    def encode_dataset(self, variables, images, batch: int = 64):
        """Images -> stacked permuter streams, once (cached-codes pipeline).

        The first stage is frozen, so codes are immutable; caching removes
        the frozen conv encode (~25 ms of the profiled 147 ms p6c18 step)
        from every train step. Returns a dict of (N, L) numpy int arrays
        usable as the `x` of `train_step`/`train_steps` (they dispatch on
        dict inputs to `Dualformer.forward_tokens`).
        """
        import numpy as np

        enc = self.make_encode_fn(variables)

        # dispatch every batch before gathering any: enc() is async, so the
        # host upload of batch i+1 overlaps the device encode of batch i
        # (device_get inside the loop serialized a full round trip per batch)
        pending = [enc(jnp.asarray(images[i:i + batch]))
                   for i in range(0, len(images), batch)]
        outs = [jax.device_get(p) for p in pending]
        return {k: np.concatenate([o[k] for o in outs], axis=0)
                for k in outs[0]}

    def eval_step(self, state: Stage2State, variables, x, c):
        v = {
            "transformer": {**variables["transformer"], "params": state.params},
            "first_stage": variables["first_stage"],
        }
        if isinstance(x, dict):
            out = self.model.forward_tokens(v, x, c)
        else:
            out = self.model.forward(v, x, c)
        return {
            "val_loss": self.model.loss(out),
            "val_content_loss": out["content_loss"],
            "val_position_loss": out["position_loss"],
            "val_coarse_position_loss": out["coarse_position_loss"],
            "val_fine_position_loss": out["fine_position_loss"],
        }

"""Epoch training loop: the Lightning-Trainer replacement.

Covers the reference runtime surface (SURVEY.md §2.1, §5): per-step jitted
train step over a data-parallel mesh, periodic metric logging (reference
metric names), PNG image grids every `image_log_frequency` batches
(`utils/logger.py:57-147`; `train.py:214-222` sets 50), validation each epoch,
orbax checkpointing (monitor-based top-k + last, `train.py:152-185`) with
auto-resume from the latest step.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import device_prefetch
from ..parallel.mesh import make_mesh, batch_sharding
from ..utils.logging import ImageLogger, MetricLogger
from ..utils import viz
from .stage1 import Stage1Trainer
from .stage2 import Stage2Trainer


_CPU0 = None


def _host_schedule(schedule, step) -> float:
    """Evaluate an optax schedule on the LOCAL CPU device.

    With the default device on the tunneled axon TPU, `float(schedule(gs))`
    is a remote dispatch + a full HTTP round trip per logged row — measured
    as part of the r05 campaign's 303 s log_sync bucket."""
    global _CPU0
    if _CPU0 is None:
        try:
            _CPU0 = jax.devices("cpu")[0]
        except Exception:
            _CPU0 = False
    if _CPU0 is False:
        return float(schedule(step))
    with jax.default_device(_CPU0):
        return float(schedule(step))


class _LogPacker:
    """Pull a whole metrics dict in ONE device->host transfer.

    On the tunneled axon platform every scalar `float()` is a full HTTP
    round trip; the r05 campaign measured log_sync = 303 s over 288
    dispatch groups (~1.05 s/group for ~10 scalars pulled one by one).
    `pack` stacks the scalars into a single f32 vector in a tiny jitted
    program (dispatched asynchronously while the next group trains);
    `unpack` materializes it with one transfer.
    """

    def __init__(self, last_of_stack: bool):
        self.last = last_of_stack
        self.keys = None
        self.fn = None

    def pack(self, logs):
        if self.fn is None:
            self.keys = sorted(logs)
            take = (lambda a: a[-1]) if self.last else (lambda a: a)
            self.fn = jax.jit(
                lambda d: jnp.stack(
                    [take(d[kk]).astype(jnp.float32) for kk in self.keys]
                )
            )
        return self.fn(logs)

    def unpack(self, vec) -> dict:
        return dict(zip(self.keys, map(float, np.asarray(vec))))


def _is_stage2(model) -> bool:
    return hasattr(model, "transformer") and hasattr(model, "first_stage_model")


class PreemptionGuard:
    """Graceful-preemption handler (SURVEY.md §5 'failure detection' — the
    reference has none; Lightning just dies and loses the partial epoch).

    Installs SIGTERM/SIGUSR1 handlers for the duration of a fit; when a
    managed runtime (borg/k8s/TPU maintenance) signals shutdown, the training
    loop finishes the in-flight step, saves an emergency checkpoint and
    returns cleanly — auto-resume then continues mid-epoch instead of
    rewinding to the last epoch boundary."""

    def __init__(self):
        import signal

        self._signal = signal
        self._hit: Optional[str] = None
        self._prev = {}

    def __enter__(self):
        try:
            for sig in (self._signal.SIGTERM, self._signal.SIGUSR1):
                self._prev[sig] = self._signal.signal(sig, self._on_signal)
        except ValueError:
            pass  # not in main thread (tests/embedded use): stays a no-op
        return self

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            self._signal.signal(sig, prev)
        return False

    def _on_signal(self, signum, frame):
        self._hit = self._signal.Signals(signum).name

    @property
    def should_stop(self) -> bool:
        return self._hit is not None

    @property
    def reason(self) -> Optional[str]:
        return self._hit


class Trainer:
    def __init__(
        self,
        logdir: str,
        max_epochs: int = 1,
        seed: int = 23,
        log_every: int = 50,
        image_log_frequency: int = 50,
        save_top_k: int = 3,
        mesh=None,
        max_steps_per_epoch: Optional[int] = None,
        resume: bool = True,
        profile_steps: int = 0,
        accumulate_grad_batches: int = 1,
        steps_per_dispatch: Optional[int] = None,
        cached_codes: str = "auto",
        opt_sharding: bool = False,
        fsdp: bool = False,
        tp: int = 1,
        sp: int = 1,
        pp: int = 1,
        pp_microbatches: int = 2,
        logtype: str = "csv",
    ):
        self.logdir = logdir
        self.max_epochs = max_epochs
        self.seed = seed
        self.log_every = log_every
        self.save_top_k = save_top_k
        # --tp N: Megatron-style tensor parallelism for the stage-2
        # transformer over a (dp, tp) mesh (`parallel/mesh.make_mesh_2d` +
        # `stage2_param_shardings`) — a one-flag scaling axis matching the
        # reference's CLI bar (`/root/reference/train.py:227-230`), beyond
        # its DDP-only strategy. Composes with --activate_ddp_share (ZeRO-1
        # moments over dp) and --activate_fsdp (tp-replicated leaves
        # dp-sharded).
        self.tp = int(tp)
        # --sp N / --pp N: sequence parallelism (ring attention) / GPipe
        # pipeline parallelism for the stage-2 transformer over a (dp, sp)
        # or (dp, pp) mesh — the training forward is swapped for
        # `parallel/stackgpt_sp.py` / `parallel/stackgpt_pp.py` (params stay
        # replicated over the model axis; activations shard).
        self.sp = int(sp)
        self.pp = int(pp)
        self.pp_microbatches = int(pp_microbatches)
        if sum(a > 1 for a in (self.tp, self.sp, self.pp)) > 1:
            raise ValueError(
                "--tp/--sp/--pp are mutually exclusive axes (supported "
                "matrix: dp x {tp|sp|pp} x {ZeRO-1|FSDP}; see "
                "docs/PARALLELISM.md)"
            )
        model_axis = (
            ("tp", self.tp) if self.tp > 1 else
            ("sp", self.sp) if self.sp > 1 else
            ("pp", self.pp) if self.pp > 1 else None
        )
        if mesh is None:
            if model_axis is not None:
                import jax as _jax

                name, n = model_axis
                ndev = len(_jax.devices())
                if ndev % n:
                    raise ValueError(f"--{name} {n} does not divide {ndev} devices")
                from ..parallel.mesh import make_mesh_2d

                mesh = make_mesh_2d(ndev // n, n, axis2=name)
            else:
                mesh = make_mesh()
        self.mesh = mesh
        self.max_steps_per_epoch = max_steps_per_epoch
        self.resume = resume
        self.profile_steps = profile_steps
        # reference `accumulate_grad_batches`: each optimizer step consumes
        # this many loader batches (stacked to (accum, B, ...); grads
        # averaged inside the train step). Trailing incomplete groups at
        # epoch end are dropped.
        self.accum = int(accumulate_grad_batches)
        # TPU-native (no reference analog): run K full optimizer steps per
        # dispatch (trainer.train_steps lax.scan) — amortizes per-dispatch
        # host overhead. Logging/image cadence then ticks once per K steps;
        # trailing incomplete groups at epoch end are dropped (like accum).
        # None = auto: 8 on the stage-2 cached-codes path (token streams are
        # cheap to group; measured dispatch-floor win), else 1.
        self._steps_per_dispatch_auto = steps_per_dispatch is None
        self.steps_per_dispatch = 1 if steps_per_dispatch is None else int(steps_per_dispatch)
        # Cached-codes stage-2 training ("auto" | "on" | "off"): the first
        # stage is frozen (reference `dqtransformer_uncond_entropy.py:86-91`),
        # so each epoch's codes are computed ONCE in a bulk pre-encode pass
        # (~16x the train rate) and the train steps consume pure token
        # streams (`Dualformer.forward_tokens`) — the frozen conv encode
        # leaves the hot step entirely. Augmentation semantics are unchanged:
        # the pre-encode pass runs per epoch on that epoch's augmented
        # stream. "auto" = on whenever accum == 1 (the cached scan path
        # supports no microbatch axis).
        self.cached_codes = cached_codes
        # reference --activate_ddp_share ("ddp_sharded" / ZeRO-1): shard the
        # adam moments over dp, keep params replicated
        self.opt_sharding = opt_sharding
        # --activate_fsdp (ZeRO-3 analog, beyond the reference): also shard
        # the params over dp; GSPMD gathers at use / reduce-scatters grads
        self.fsdp = fsdp
        # leaves below this many elements stay replicated under either
        # sharding flag (collective overhead beats the memory win)
        self.shard_min_elements = 65536
        self._profiling = False
        os.makedirs(logdir, exist_ok=True)
        self.metrics = MetricLogger(logdir, logtype=logtype)
        self.images = ImageLogger(logdir, batch_frequency=image_log_frequency)

    def _state_shardings(self, state, opt_fields, param_fields=()):
        """NamedTuple-shaped sharding tree: optimizer fields ZeRO-1-sharded
        over dp (and with fsdp, param fields too), everything else
        replicated. None when no sharding flag is on (jit then infers from
        argument placement)."""
        if not (self.opt_sharding or self.fsdp):
            return None
        from ..parallel.mesh import (
            fsdp_param_shardings,
            opt_state_shardings,
            replicated,
        )

        repl = replicated(self.mesh)
        tree = jax.tree_util.tree_map(lambda _: repl, state)
        fields = {
            f: opt_state_shardings(self.mesh, getattr(state, f),
                                   min_elements=self.shard_min_elements)
            for f in opt_fields
        }
        if self.fsdp:
            fields.update({
                f: fsdp_param_shardings(self.mesh, getattr(state, f),
                                        min_elements=self.shard_min_elements)
                for f in param_fields
            })
        return tree._replace(**fields)

    def _stage2_state_shardings(self, state):
        """Stage-2 state sharding tree: tensor parallelism (params split per
        `stage2_param_shardings`, moments following their params via
        `tree_shardings_like`), composed with ZeRO-1 / FSDP on the
        tp-replicated leaves; falls back to `_state_shardings` when tp=1."""
        if self.tp <= 1:
            return self._state_shardings(state, ("opt",), param_fields=("params",))
        from ..parallel.mesh import (
            replicated,
            stage2_param_shardings,
            tree_shardings_like,
            zero1_leaf_spec,
        )

        repl = replicated(self.mesh)
        p_sh = stage2_param_shardings(self.mesh, state.params)
        if self.fsdp:
            # 2D FSDP+TP: leaves the tp rules left replicated get dp-sharded
            from jax.sharding import PartitionSpec as _P

            p_sh = jax.tree_util.tree_map(
                lambda leaf, sh: sh if sh.spec != _P() else zero1_leaf_spec(
                    self.mesh, leaf, self.shard_min_elements),
                state.params, p_sh,
            )
        o_sh = tree_shardings_like(self.mesh, state.opt, state.params, p_sh)
        if self.opt_sharding or self.fsdp:
            # ZeRO-1 composition: any moment the tp rules left REPLICATED
            # (embeddings, layernorms, heads — matched or not) shards over dp
            from jax.sharding import PartitionSpec as _P

            o_sh = jax.tree_util.tree_map(
                lambda leaf, sh: sh if sh.spec != _P() else zero1_leaf_spec(
                    self.mesh, leaf, self.shard_min_elements),
                state.opt, o_sh,
            )
        tree = jax.tree_util.tree_map(lambda _: repl, state)
        return tree._replace(params=p_sh, opt=o_sh)

    def _group_microbatches(self, gen):
        """Yield pytrees of step inputs: pass-through at accum=1, else stacked
        (accum, B, ...) groups of `accum` consecutive loader outputs."""
        if self.accum == 1:
            yield from gen
            return
        buf = []
        for item in gen:
            buf.append(item)
            if len(buf) == self.accum:
                yield jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *buf)
                buf = []

    def _group_steps(self, gen, timings=None):
        """Stack groups of `steps_per_dispatch` step inputs to (K, ...);
        pass-through at K=1.

        numpy leaves stack on the HOST (np.stack — no device round trip);
        device leaves stack with jnp.stack. The cached-codes path feeds
        numpy so a whole dispatch group becomes one `device_put` per stream
        downstream instead of K per-batch transfers plus an on-device stack
        (r04's committed campaign lost ~33% of the benched rate to exactly
        this per-group host/tunnel chatter)."""
        if self.steps_per_dispatch == 1:
            yield from gen
            return

        def stack(*xs):
            if isinstance(xs[0], np.ndarray):
                return np.stack(xs)
            return jnp.stack(xs)

        buf = []
        for item in gen:
            buf.append(item)
            if len(buf) == self.steps_per_dispatch:
                t0 = time.perf_counter()
                out = jax.tree_util.tree_map(stack, *buf)
                if timings is not None:
                    timings["assemble"] = (
                        timings.get("assemble", 0.0)
                        + time.perf_counter() - t0
                    )
                yield out
                buf = []

    def _maybe_profile(self, global_step: int):
        """Capture a jax.profiler trace of the first `profile_steps` steps
        (the reference has no profiling story — SURVEY.md §5)."""
        if not self.profile_steps:
            return
        if global_step == 0 and not self._profiling:
            jax.profiler.start_trace(os.path.join(self.logdir, "profile"))
            self._profiling = True
        elif self._profiling and global_step >= self.profile_steps:
            jax.profiler.stop_trace()
            self._profiling = False
            print(f"profiler trace written to {self.logdir}/profile")

    # -------------------------------------------------------------- ckpt io
    def _ckpt_manager(self, monitor: Optional[str]):
        import orbax.checkpoint as ocp

        if monitor:
            # top-k by monitor PLUS the chronologically-latest step, so resume
            # never rewinds past a bad epoch (reference ModelCheckpoint
            # save_top_k + save_last)
            from orbax.checkpoint.checkpoint_managers import preservation_policy as pp

            keep = pp.AnyPreservationPolicy([
                pp.LatestN(n=1),
                pp.BestN(
                    get_metric_fn=lambda m: m.get(monitor, 0.0),
                    reverse=True,  # smaller metric = better (loss monitors)
                    n=self.save_top_k,
                ),
            ])
            options = ocp.CheckpointManagerOptions(
                preservation_policy=keep, create=True
            )
        else:
            options = ocp.CheckpointManagerOptions(
                max_to_keep=self.save_top_k, create=True
            )
        return ocp.CheckpointManager(
            os.path.abspath(os.path.join(self.logdir, "checkpoints")), options=options
        )

    def _emergency_save(self, mngr, state, reason):
        import orbax.checkpoint as ocp

        step = int(state.step)
        try:
            mngr.save(step, args=ocp.args.StandardSave(state), force=True)
            mngr.wait_until_finished()
            print(f"[preempt:{reason}] emergency checkpoint saved at step {step}")
        except Exception as e:  # never mask the shutdown on a save failure
            print(f"[preempt:{reason}] emergency save FAILED: {e}")

    # ------------------------------------------------------------------ fit
    def fit(self, model, data, eval_only: bool = False):
        train_loader = data.train_dataloader(seed=self.seed)
        steps_per_epoch = len(train_loader)
        if self.max_steps_per_epoch:
            steps_per_epoch = min(steps_per_epoch, self.max_steps_per_epoch)
        # reference train.py:243-245
        model.steps_per_epoch = steps_per_epoch
        model.training_steps = max(steps_per_epoch * self.max_epochs, 1)

        warmup_steps = int(steps_per_epoch * (model.warmup_epochs or 0))
        if _is_stage2(model):
            return self._fit_stage2(model, data, train_loader, warmup_steps,
                                    eval_only=eval_only)
        return self._fit_stage1(model, data, train_loader, warmup_steps,
                                eval_only=eval_only)

    # --------------------------------------------------------------- stage 1
    def _fit_stage1(self, model, data, train_loader, warmup_steps, eval_only=False):
        if self.tp > 1 or self.sp > 1 or self.pp > 1:
            raise ValueError(
                "--tp/--sp/--pp target the stage-2 transformer; stage-1 "
                "(conv DQ-VAE) scales with dp / --activate_ddp_share / "
                "--activate_fsdp"
            )
        trainer = Stage1Trainer(
            model,
            learning_rate=model.learning_rate,
            min_learning_rate=model.min_learning_rate,
            warmup_steps=warmup_steps,
            max_steps=model.training_steps,
            accum=self.accum,
        )
        sample = next(iter(train_loader.epoch(0)))
        x0 = model.get_input(sample, model.image_key)
        state = trainer.init_state(jax.random.PRNGKey(self.seed), x0[:1])

        mngr = self._ckpt_manager(model.monitor)
        if self.resume and mngr.latest_step() is not None:
            import orbax.checkpoint as ocp

            state = mngr.restore(
                mngr.latest_step(), args=ocp.args.StandardRestore(state)
            )
            print(f"Resumed from checkpoint step {mngr.latest_step()}")

        b_sh = batch_sharding(self.mesh)
        # with accumulation the step input gains a leading microbatch axis;
        # the data-parallel shard moves to axis 1
        from jax.sharding import NamedSharding, PartitionSpec as P

        x_sh = b_sh if self.accum == 1 else NamedSharding(self.mesh, P(None, "dp"))
        k = self.steps_per_dispatch
        if k > 1:
            x_sh = NamedSharding(
                self.mesh, P(*((None,) * (1 if self.accum == 1 else 2)), "dp")
            )
        st_sh = self._state_shardings(state, ("ae_opt", "disc_opt"),
                                      param_fields=("ae_params", "loss_params"))
        if st_sh is not None:
            state = jax.device_put(state, st_sh)
        # per-step PRNG derives inside the jit from a constant base key +
        # state.step (see the stage-2 loop note; removes a host dispatch
        # per iteration)
        inner1 = trainer.train_steps if k > 1 else trainer.train_step
        step_fn = jax.jit(lambda s, x, base: inner1(
                              s, x, jax.random.fold_in(base, s.step)),
                          in_shardings=(st_sh, x_sh, None),
                          out_shardings=(st_sh, None) if st_sh else None,
                          donate_argnums=(0,))
        eval_fn = jax.jit(trainer.eval_step, in_shardings=(None, b_sh))
        forward_fn = jax.jit(
            lambda st, x: model.net.apply({"params": st.ae_params, "ema": st.ema}, x)
        )

        if eval_only:
            val_metrics = self._validate_stage1(model, data, eval_fn, state)
            self.metrics.log(int(state.step), val_metrics, "val")
            print("eval: " + " ".join(f"{k}={v:.4f}" for k, v in val_metrics.items()))
            return state

        rng_base = jax.random.PRNGKey(self.seed + 1)
        gs = int(state.step)  # host-side step mirror (see stage-2 loop note)
        start_epoch = int(state.epoch)
        buckets = {}
        t_fit = time.perf_counter()
        with PreemptionGuard() as guard:
            for epoch in range(start_epoch, self.max_epochs):
                t0 = time.time()
                inputs = (
                    model.get_input(batch, model.image_key)
                    for batch in device_prefetch(train_loader.epoch(epoch),
                                                 b_sh, timings=buckets)
                )
                groups = self._group_steps(
                    self._group_microbatches(inputs), timings=buckets
                )
                pending = None  # lag-one metric flush (see stage-2 loop)
                packer = _LogPacker(last_of_stack=k > 1)

                def _flush(p):
                    t_s = time.perf_counter()
                    gs_p, vec, ips = p
                    logs_np = packer.unpack(vec)  # ONE device pull
                    logs_np["images_per_sec"] = ips
                    # reference LearningRateMonitor (train.py:207-213)
                    logs_np["lr"] = _host_schedule(trainer.ae_schedule, gs_p)
                    self.metrics.log(gs_p, logs_np, "train")
                    buckets["log_sync"] = (
                        buckets.get("log_sync", 0.0)
                        + time.perf_counter() - t_s
                    )

                it = iter(groups)
                bi = -1
                while True:
                    t_p = time.perf_counter()
                    try:
                        x = next(it)
                    except StopIteration:
                        break
                    buckets["pull"] = (
                        buckets.get("pull", 0.0) + time.perf_counter() - t_p
                    )
                    bi += 1
                    # cadences/budgets are in OPTIMIZER steps: with
                    # steps_per_dispatch K>1 each iteration advances K steps
                    if (self.max_steps_per_epoch
                            and bi * k >= self.max_steps_per_epoch):
                        break
                    self._maybe_profile(gs)
                    t_d = time.perf_counter()
                    state, logs = step_fn(state, x, rng_base)
                    buckets["dispatch"] = (
                        buckets.get("dispatch", 0.0)
                        + time.perf_counter() - t_d
                    )
                    gs += k
                    if pending is not None:
                        _flush(pending)
                        pending = None
                    if guard.should_stop:
                        self._emergency_save(mngr, state, guard.reason)
                        return state
                    bsz = x.shape[(1 if k > 1 else 0)
                                  + (1 if self.accum > 1 else 0)]
                    if (bi * k) % self.log_every < k:
                        ips = (
                            k * self.accum * bsz * (bi + 1)
                            / max(time.time() - t0, 1e-9)
                        )
                        pending = (gs, packer.pack(logs), ips)
                    if self.images.should_log(bi * k, k):
                        t_i = time.perf_counter()
                        xl = x if k == 1 else x[-1]
                        x_vis = xl if self.accum == 1 else xl[0]
                        self._log_stage1_images(model, forward_fn, state, x_vis,
                                                "train", gs, epoch, bi)
                        buckets["image_log"] = (
                            buckets.get("image_log", 0.0)
                            + time.perf_counter() - t_i
                        )
                if pending is not None:
                    _flush(pending)
                state = state._replace(epoch=state.epoch + 1)

                t_v = time.perf_counter()
                val_metrics = self._validate_stage1(model, data, eval_fn, state)
                self.metrics.log(gs, val_metrics, "val")
                import orbax.checkpoint as ocp

                # orbax async checkpointing: save() returns once the state is
                # snapshotted off the device; the directory write proceeds in
                # the background and overlaps the next epoch's training (the
                # manager serializes with any still-running prior save
                # itself). The r05 campaign's val_ckpt bucket was 1326 s of
                # a 2511 s run with the synchronous wait here.
                mngr.save(
                    gs,
                    args=ocp.args.StandardSave(state),
                    metrics={k: float(v) for k, v in val_metrics.items()},
                )
                buckets["val_ckpt"] = (
                    buckets.get("val_ckpt", 0.0) + time.perf_counter() - t_v
                )
                print(
                    f"epoch {epoch}: " +
                    " ".join(f"{k}={v:.4f}" for k, v in val_metrics.items())
                )
            t_v = time.perf_counter()
            mngr.wait_until_finished()
            buckets["val_ckpt"] = (
                buckets.get("val_ckpt", 0.0) + time.perf_counter() - t_v
            )
        self._write_buckets(buckets, time.perf_counter() - t_fit, gs)
        return state

    def _validate_stage1(self, model, data, eval_fn, state):
        val_loader = data.val_dataloader(seed=self.seed)
        b_sh = batch_sharding(self.mesh)
        acc, n = None, 0
        for bi, batch in enumerate(device_prefetch(val_loader.epoch(0), b_sh)):
            if self.max_steps_per_epoch and bi >= self.max_steps_per_epoch:
                break
            x = model.get_input(batch, model.image_key)
            logs = eval_fn(state, x)
            # accumulate on device; one host sync at the end
            acc = logs if acc is None else jax.tree_util.tree_map(jnp.add, acc, logs)
            n += 1
        if acc is None:
            return {}
        return {k: float(v) / n for k, v in acc.items()}

    def _log_stage1_images(self, model, forward_fn, state, x, split, gs, epoch, bi):
        xrec, _, grains, _, x_entropy = forward_fn(state, x)
        imgs = {
            "inputs": np.asarray(x[:4]),
            "reconstructions": np.asarray(xrec[:4]),
            "grain_map": viz.draw_grain_map_color(
                np.asarray(x[:4]), np.asarray(grains[:4])
            ),
        }
        if x_entropy is not None:
            e = np.asarray(x_entropy[:4])
            e = (e - e.min()) / max(e.max() - e.min(), 1e-5)
            imgs["entropy_map"] = viz.draw_grain_map_color(np.asarray(x[:4]), e)
        self.images.log(imgs, split, gs, epoch, bi)

    # --------------------------------------------------------------- stage 2
    def _fit_stage2(self, model, data, train_loader, warmup_steps, eval_only=False):
        if self.sp > 1:
            from ..parallel.stackgpt_sp import stackgpt_train_losses_sp

            model.transformer_train_apply = (
                lambda v, kw, r: stackgpt_train_losses_sp(
                    model, v, self.mesh, kw, rngs=r
                )
            )
        elif self.pp > 1:
            from ..parallel.stackgpt_pp import stackgpt_train_losses_pp

            model.transformer_train_apply = (
                lambda v, kw, r: stackgpt_train_losses_pp(
                    model, v, self.mesh, kw,
                    microbatches=self.pp_microbatches, rngs=r,
                )
            )
        trainer = Stage2Trainer(
            model,
            learning_rate=model.learning_rate,
            min_learning_rate=model.min_learning_rate,
            warmup_steps=warmup_steps,
            max_steps=model.training_steps,
            accum=self.accum,
            compute_dtype=getattr(model, "compute_dtype", None),
            dropout_prng_impl=getattr(model, "dropout_prng_impl", "rbg"),
            # the fused Pallas optimizer operates on unsharded (replicated or
            # dp-replicated) leaves; under tensor parallelism the optax chain
            # runs sharded via GSPMD instead
            fused_adamw=False if self.tp > 1 else None,
        )
        use_cached = self.cached_codes == "on" or (
            self.cached_codes == "auto" and self.accum == 1
        )
        if use_cached and self.accum != 1:
            raise ValueError("--cached_codes on requires "
                             "accumulate_grad_batches=1")
        # cached token streams carry image codes (+ class labels) only; any
        # other conditioning — notably T2IDualformer with
        # use_text_conditioning=True — would silently train without its
        # condition (ADVICE r04). Refuse explicit "on"; downgrade "auto".
        if use_cached and (
            model.cond_stage_key not in ("image", "class_label")
            or getattr(model, "use_text_conditioning", False)
        ):
            if self.cached_codes == "on":
                raise ValueError(
                    "--cached_codes on supports image/class_label "
                    f"conditioning only (cond_stage_key="
                    f"{model.cond_stage_key!r}, use_text_conditioning="
                    f"{getattr(model, 'use_text_conditioning', False)}); "
                    "text features are not cached alongside token streams"
                )
            print(
                "cached_codes auto: OFF — "
                f"cond_stage_key={model.cond_stage_key!r} needs per-step "
                "conditioning"
            )
            use_cached = False
        if self._steps_per_dispatch_auto and use_cached:
            # token-stream steps group cheaply; K=8 amortizes the
            # per-dispatch host floor (measured 59.9 -> 76.8 img/s at p6c18
            # geometry, cached+flash+bf16, K=1 vs K=8 — the ~31 ms/step host
            # dispatch drops to ~2 ms/step). Capped by the epoch's step
            # budget so short/capped epochs still fill a dispatch group
            # (trailing incomplete groups are dropped).
            self.steps_per_dispatch = max(
                1, min(8, model.steps_per_epoch or 8)
            )
        # first stage weights from its config ckpt_path (reference embeds the
        # stage-1 ckpt under first_stage_config.params.ckpt_path)
        fs_model = model.first_stage_model
        if fs_model.ckpt_path and os.path.exists(str(fs_model.ckpt_path)):
            fs_vars = _load_first_stage(fs_model)
        else:
            fs_vars = fs_model.init(jax.random.PRNGKey(self.seed + 5))
        variables = model.init(jax.random.PRNGKey(self.seed), fs_vars)
        state = trainer.init_state(variables)

        mngr = self._ckpt_manager(model.monitor)
        if self.resume and mngr.latest_step() is not None:
            import orbax.checkpoint as ocp

            state = mngr.restore(
                mngr.latest_step(), args=ocp.args.StandardRestore(state)
            )
            print(f"Resumed from checkpoint step {mngr.latest_step()}")

        b_sh = batch_sharding(self.mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        x_sh = b_sh if self.accum == 1 else NamedSharding(self.mesh, P(None, "dp"))
        k = self.steps_per_dispatch
        if k > 1:
            x_sh = NamedSharding(
                self.mesh, P(*((None,) * (1 if self.accum == 1 else 2)), "dp")
            )
        st_sh = self._stage2_state_shardings(state)
        if st_sh is not None:
            state = jax.device_put(state, st_sh)
        # the caller passes a CONSTANT base key; the per-step key is
        # fold_in(base, state.step) derived inside the compiled program
        # (no per-iteration host-side split dispatch)
        if k > 1:
            step_fn = jax.jit(
                lambda s, v, xs, cs, base: trainer.train_steps(
                    s, v, xs, cs, jax.random.fold_in(base, s.step)),
                in_shardings=(st_sh, None, x_sh, x_sh, None),
                out_shardings=(st_sh, None) if st_sh else None,
                donate_argnums=(0,))
        else:
            step_fn = jax.jit(
                lambda s, v, x, c, base: trainer.train_step(
                    s, v, x, c, jax.random.fold_in(base, s.step)),
                in_shardings=(st_sh, None, x_sh, x_sh, None),
                out_shardings=(st_sh, None) if st_sh else None,
                donate_argnums=(0,))
        eval_fn = jax.jit(trainer.eval_step, in_shardings=(None, None, b_sh, b_sh))

        if eval_only:
            val_metrics = self._validate_stage2(model, data, eval_fn, state, variables)
            self.metrics.log(int(state.step), val_metrics, "val")
            print("eval: " + " ".join(f"{k}={v:.4f}" for k, v in val_metrics.items()))
            return state

        # the per-step dropout key derives INSIDE the jitted step from a
        # constant base key + state.step (fold_in) — zero per-iteration host
        # dispatches, and resume-deterministic (the key depends only on the
        # global step, not on how many times the host process restarted)
        rng_base = jax.random.PRNGKey(self.seed + 1)
        # host-side global-step mirror: the r04 loop called int(state.step)
        # every iteration (profiling/log cadence), a full device sync per
        # dispatch group that serialized host and device — the single
        # largest contributor to the committed campaign sustaining 46-52
        # img/s where the bare bench measured 76.9 on identical geometry
        gs = int(state.step)
        start_epoch = int(state.epoch)
        enc_fn = trainer.make_encode_fn(variables) if use_cached else None
        buckets = {}
        t_fit = time.perf_counter()
        with PreemptionGuard() as guard:
            for epoch in range(start_epoch, self.max_epochs):
                vis = None
                enc_secs = 0.0
                if use_cached:
                    t_enc = time.time()
                    cached, vis = self._encode_epoch_codes(
                        model, enc_fn, train_loader, epoch, b_sh
                    )
                    enc_secs = time.time() - t_enc
                    buckets["encode"] = buckets.get("encode", 0.0) + enc_secs

                    def gen():
                        # numpy int32 streams: the whole dispatch group is
                        # stacked on HOST and lands as ONE device_put per
                        # stream (device_prefetch below) — not K per-batch
                        # jnp.asarray transfers + an on-device stack
                        for z, cc in cached:
                            xz = {kk: np.ascontiguousarray(v, dtype=np.int32)
                                  for kk, v in z.items()}
                            yield (xz, cc)

                    inputs = gen()
                else:
                    def _xc(batch):
                        x = model.first_stage_model.get_input(batch, model.first_stage_key)
                        if model.cond_stage_key == "class_label":
                            return x, jnp.asarray(batch["class_label"])
                        return x, x

                    inputs = (
                        _xc(batch)
                        for batch in device_prefetch(train_loader.epoch(epoch), b_sh)
                    )
                grouped = self._group_steps(
                    self._group_microbatches(inputs), timings=buckets
                )
                groups = (
                    device_prefetch(grouped, x_sh, timings=buckets)
                    if use_cached else grouped
                )
                t0 = time.time()
                pending = None  # lag-one metric flush (see _flush)
                packer = _LogPacker(last_of_stack=k > 1)

                def _flush(p):
                    # materializing log floats blocks on the device; by
                    # flushing one tick LATE (the next group already queued)
                    # the sync overlaps useful device work instead of
                    # draining the pipeline. The metrics arrive as ONE
                    # packed vector pull (_LogPacker) — per-scalar float()
                    # pulls cost ~1.05 s/group in tunnel round trips (r05
                    # campaign, log_sync bucket 303 s / 288 groups).
                    t_s = time.perf_counter()
                    gs_p, vec, ips, extra = p
                    logs_np = packer.unpack(vec)  # ONE device pull
                    logs_np["lr"] = _host_schedule(trainer.schedule, gs_p)
                    logs_np["images_per_sec"] = ips
                    logs_np.update(extra)
                    self.metrics.log(gs_p, logs_np, "train")
                    buckets["log_sync"] = (
                        buckets.get("log_sync", 0.0)
                        + time.perf_counter() - t_s
                    )

                it = iter(groups)
                bi = -1
                while True:
                    t_p = time.perf_counter()
                    try:
                        x, c = next(it)
                    except StopIteration:
                        break
                    buckets["pull"] = (
                        buckets.get("pull", 0.0) + time.perf_counter() - t_p
                    )
                    bi += 1
                    # optimizer-step units (see stage-1 loop note)
                    if (self.max_steps_per_epoch
                            and bi * k >= self.max_steps_per_epoch):
                        break
                    self._maybe_profile(gs)
                    t_d = time.perf_counter()
                    state, logs = step_fn(
                        state, variables, x, x if c is None else c, rng_base
                    )
                    buckets["dispatch"] = (
                        buckets.get("dispatch", 0.0)
                        + time.perf_counter() - t_d
                    )
                    gs += k
                    if pending is not None:
                        _flush(pending)
                        pending = None
                    if guard.should_stop:
                        self._emergency_save(mngr, state, guard.reason)
                        return state
                    if (bi * k) % self.log_every < k:
                        leaf = jax.tree_util.tree_leaves(x)[0]
                        bsz = leaf.shape[
                            (1 if k > 1 else 0) + (1 if self.accum > 1 else 0)
                        ]
                        ips = (
                            k * self.accum * bsz * (bi + 1)
                            / max(time.time() - t0, 1e-9)
                        )
                        extra = (
                            {"cache_encode_seconds": enc_secs}
                            if enc_secs and bi == 0 else {}
                        )
                        pending = (gs, packer.pack(logs), ips, extra)
                    if self.images.should_log(bi * k, k):
                        t_i = time.perf_counter()
                        if use_cached:
                            x_img, c_img = vis
                            c_img = x_img if c_img is None else c_img
                        else:
                            xl = x if k == 1 else jax.tree_util.tree_map(
                                lambda a: a[-1], x)
                            cl = c if k == 1 else jax.tree_util.tree_map(
                                lambda a: a[-1], c)
                            x_img = xl if self.accum == 1 else xl[0]
                            c_img = cl if self.accum == 1 else cl[0]
                        self._log_stage2_images(
                            model, variables, state, x_img, c_img,
                            "train", gs, epoch, bi,
                        )
                        buckets["image_log"] = (
                            buckets.get("image_log", 0.0)
                            + time.perf_counter() - t_i
                        )
                if pending is not None:
                    _flush(pending)
                state = state._replace(epoch=state.epoch + 1)

                t_v = time.perf_counter()
                val_metrics = self._validate_stage2(model, data, eval_fn, state, variables)
                self.metrics.log(gs, val_metrics, "val")
                import orbax.checkpoint as ocp

                # async checkpoint: the directory write overlaps the next
                # epoch (see the stage-1 loop's note; r05 val_ckpt was
                # 1326 s of a 2511 s campaign with the synchronous wait)
                mngr.save(gs, args=ocp.args.StandardSave(state),
                          metrics={k: float(v) for k, v in val_metrics.items()})
                buckets["val_ckpt"] = (
                    buckets.get("val_ckpt", 0.0) + time.perf_counter() - t_v
                )
                print(
                    f"epoch {epoch}: " +
                    " ".join(f"{k}={v:.4f}" for k, v in val_metrics.items())
                )
            t_v = time.perf_counter()
            mngr.wait_until_finished()
            buckets["val_ckpt"] = (
                buckets.get("val_ckpt", 0.0) + time.perf_counter() - t_v
            )
        self._write_buckets(buckets, time.perf_counter() - t_fit, gs)
        return state

    def _write_buckets(self, buckets, wall, gs):
        """Per-bucket host-loop attribution -> <logdir>/loop_buckets.json.

        "device_wait" is wall time not attributed to any measured host
        bucket — in a healthy loop it is where the host sits blocked (or
        idle-ahead) while the device executes; host buckets (pull/assemble/
        transfer/dispatch) staying small relative to it is the signature of
        a device-bound loop."""
        import json as _json

        accounted = sum(
            v for k_, v in buckets.items()
            if k_ not in ("assemble", "transfer")  # sub-buckets of "pull"
        )
        out = {
            "wall_seconds": round(wall, 3),
            "global_step": gs,
            "buckets": {k_: round(v, 3) for k_, v in sorted(buckets.items())},
            "device_wait_seconds": round(max(wall - accounted, 0.0), 3),
        }
        with open(os.path.join(self.logdir, "loop_buckets.json"), "w") as f:
            _json.dump(out, f, indent=1)

    def _encode_epoch_codes(self, model, enc_fn, train_loader, epoch, b_sh):
        """Cached-codes bulk pre-encode: one frozen-encoder pass over this
        epoch's (augmented) batch stream at encoder throughput (~16x the
        stage-2 train rate), yielding per-batch permuter-stream dicts.

        Streams are held as int16 numpy when every token id fits (max code
        1026 at the shipped geometry): ~5 KB/image, so a full ImageNet epoch
        is ~6 GB host RAM; vocabularies >= 2^15 fall back to int32 instead
        of silently wrapping (ADVICE r04). Returns (list of
        (stream dict, labels|None), (vis images, vis labels)) — the vis batch
        feeds the image logger, which needs pixels, not tokens."""
        max_id = max(
            model.vocab_size, model.fine_position_size,
            model.coarse_position_pad_code, model.coarse_position_eos_code,
            model.content_pad_code, model.content_eos_code,
            model.content_sos_code or 0,
            model.fine_position_sos_code or 0,
        )
        cache_dtype = np.int16 if max_id < 2 ** 15 else np.int32
        cached = []
        vis = None
        limit = self.max_steps_per_epoch  # optimizer steps == batches here
        pending = None  # overlap device_get with the next batch's encode
        for bi, batch in enumerate(device_prefetch(train_loader.epoch(epoch), b_sh)):
            if limit and bi >= limit:
                break
            x = model.first_stage_model.get_input(batch, model.first_stage_key)
            z_dev = enc_fn(x)
            c = (
                np.asarray(batch["class_label"])
                if model.cond_stage_key == "class_label" else None
            )
            if vis is None:
                vis = (np.asarray(x[:4]), None if c is None else c[:4])
            if pending is not None:
                zp, cp = pending
                zp = {k2: np.asarray(v).astype(cache_dtype)
                      for k2, v in jax.device_get(zp).items()}
                cached.append((zp, cp))
            pending = (z_dev, c)
        if pending is not None:
            zp, cp = pending
            zp = {k2: np.asarray(v).astype(cache_dtype)
                  for k2, v in jax.device_get(zp).items()}
            cached.append((zp, cp))
        return cached, vis

    def _log_stage2_images(self, model, variables, state, x, c, split, gs,
                           epoch, bi):
        """Sample grids during stage-2 training (reference logs every 50
        batches via `utils/logger.py:57-147` calling `model.log_images`)."""
        v = {
            "transformer": {**variables["transformer"], "params": state.params},
            "first_stage": variables["first_stage"],
        }
        batch = {model.first_stage_key: x}
        if model.cond_stage_key != "image":
            batch[model.cond_stage_key] = c
        imgs = model.log_images(v, batch, rng=jax.random.PRNGKey(gs))
        self.images.log(imgs, split, gs, epoch, bi)

    def _validate_stage2(self, model, data, eval_fn, state, variables):
        val_loader = data.val_dataloader(seed=self.seed)
        b_sh = batch_sharding(self.mesh)
        acc, n = None, 0
        for bi, batch in enumerate(device_prefetch(val_loader.epoch(0), b_sh)):
            if self.max_steps_per_epoch and bi >= self.max_steps_per_epoch:
                break
            x = model.first_stage_model.get_input(batch, model.first_stage_key)
            c = (
                jnp.asarray(batch["class_label"])
                if model.cond_stage_key == "class_label"
                else x
            )
            logs = eval_fn(state, variables, x, c)
            acc = logs if acc is None else jax.tree_util.tree_map(jnp.add, acc, logs)
            n += 1
        if acc is None:
            return {}
        return {k: float(v) / n for k, v in acc.items()}


def _load_first_stage(fs_model):
    """Shared with the sampling/serving loader (utils/model_loading.py) so
    both resolve `first_stage_config.params.ckpt_path` identically."""
    from ..utils.model_loading import load_first_stage_variables

    return load_first_stage_variables(fs_model)

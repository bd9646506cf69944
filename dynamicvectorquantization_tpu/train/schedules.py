"""LR schedules: linear warmup and linear-warmup + cosine decay.

Reference multiplier semantics: `models/stage1/utils.py:6-24` /
`models/stage2/utils.py:6-14` (LambdaLR multipliers on the base LR, floored
at ``multiplier_min``)."""
from __future__ import annotations

import jax.numpy as jnp


def linear_warmup(base_lr: float, warmup_steps: int):
    def schedule(step):
        warm = jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
        return base_lr * warm

    return schedule


def warmup_cosine(base_lr: float, warmup_steps: int, max_steps: int, multiplier_min: float = 0.0):
    def schedule(step):
        warm = step / jnp.maximum(warmup_steps, 1)
        progress = (step - warmup_steps) / jnp.maximum(max_steps - warmup_steps, 1)
        cos = 0.5 * (jnp.cos(jnp.pi * progress) + 1.0)
        mult = jnp.where(step < warmup_steps, warm, jnp.maximum(cos, multiplier_min))
        return base_lr * mult

    return schedule


def make_schedule(scheduler_type: str, base_lr, warmup_steps, max_steps, min_lr=0.0):
    if scheduler_type == "linear-warmup":
        return linear_warmup(base_lr, warmup_steps)
    if scheduler_type == "linear-warmup_cosine-decay":
        return warmup_cosine(base_lr, warmup_steps, max_steps, min_lr / max(base_lr, 1e-20))
    if scheduler_type == "lambda-warmup-cosine":
        # modules/scheduler/lr_scheduler.py multiplier schedule x base_lr
        def _s(step):
            return base_lr * lambda_warmup_cosine(
                warmup_steps, min_lr / max(base_lr, 1e-20), 1.0, 0.0, max_steps
            )(step)

        return _s
    if scheduler_type == "gradual-warmup":
        return gradual_warmup(base_lr, warmup_steps, 0, 1.0,
                              max_steps - warmup_steps, min_lr)
    raise NotImplementedError(scheduler_type)


def lambda_warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                         lr_start: float, max_decay_steps: int):
    """Reference `modules/scheduler/lr_scheduler.py:10-38`
    (LambdaWarmUpCosineScheduler; dead code there — no shipped config reaches
    it — ported for inventory completeness). A *multiplier* schedule ("use
    with a base_lr of 1.0"): linear lr_start->lr_max over warm_up_steps, then
    cosine lr_max->lr_min over (max_decay_steps - warm_up_steps)."""

    def schedule(step):
        warm = (lr_max - lr_start) / max(warm_up_steps, 1) * step + lr_start
        t = (step - warm_up_steps) / jnp.maximum(max_decay_steps - warm_up_steps, 1)
        t = jnp.minimum(t, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def gradual_warmup(base_lr: float, steps: int, buffer_steps: int,
                   multiplier: float, cosine_steps: int, min_lr: float = 0.0,
                   start_from_zero: bool = True):
    """Reference `modules/scheduler/scheduler.py:49-101` (GradualWarmup +
    Scheduler chaining into CosineAnnealingLR; also unreachable from shipped
    configs). Warmup to multiplier*base_lr over `steps`, hold through
    `buffer_steps`, then cosine-anneal to `min_lr` over `cosine_steps`."""

    def schedule(step):
        if start_from_zero:
            m = multiplier * jnp.minimum(1.0, step / jnp.maximum(steps, 1))
        else:
            m = 1 + (multiplier - 1) * jnp.minimum(1.0, step / jnp.maximum(steps, 1))
        warm_lr = base_lr * m
        t = (step - steps - buffer_steps) / jnp.maximum(cosine_steps, 1)
        t = jnp.clip(t, 0.0, 1.0)
        peak = base_lr * multiplier
        cos_lr = min_lr + 0.5 * (peak - min_lr) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(step <= steps + buffer_steps, warm_lr, cos_lr)

    return schedule

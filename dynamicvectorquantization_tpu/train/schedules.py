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
    raise NotImplementedError(scheduler_type)

"""Budget-constraint losses steering the learned router's fine-grain ratio.

Reference: `modules/dynamic_modules/budget.py`. The dual-grain loss computes
the expected code count from the (soft, gumbel) gate — 1 per coarse region,
4 per fine region — normalizes to a ratio, and penalizes MSE to the target.

Reference quirk (`budget.py:24-26`): with ``calculate_all=True`` it returns
``loss_budget_last + loss_budget_last`` — the direct-ratio term is dropped
(doubled complementary term instead of the sum of both). Replicated by
default; set ``fix_reference_bug=True`` for ``loss_budget + loss_budget_last``.
"""
from __future__ import annotations

import jax.numpy as jnp


class BudgetConstraintRatioMSEDualGrain:
    def __init__(
        self,
        target_ratio=0.0,
        gamma=1.0,
        min_grain_size=8,
        max_grain_size=16,
        calculate_all=True,
        fix_reference_bug=False,
    ):
        self.target_ratio = target_ratio
        self.gamma = gamma
        self.calculate_all = calculate_all
        self.fix_reference_bug = fix_reference_bug
        self.const = min_grain_size * min_grain_size
        self.max_const = max_grain_size * max_grain_size - self.const

    def __call__(self, gate):
        # gate: (B, Hc, Wc, 2) NHWC — 0 coarse (1 code), 1 fine (4 codes)
        beta = 1.0 * gate[..., 0] + 4.0 * gate[..., 1]
        beta = beta.sum() / gate.shape[0] - self.const
        budget_ratio = beta / self.max_const
        loss_budget = self.gamma * (budget_ratio - self.target_ratio) ** 2
        if self.calculate_all:
            loss_last = self.gamma * ((1 - budget_ratio) - (1 - self.target_ratio)) ** 2
            if self.fix_reference_bug:
                return loss_budget + loss_last
            return loss_last + loss_last  # reference behavior (budget.py:26)
        return loss_budget


class BudgetConstraintNormedSeparateRatioMSETripleGrain:
    def __init__(
        self,
        target_fine_ratio=0.0,
        target_median_ratio=0.0,
        gamma=1.0,
        min_grain_size=8,
        median_grain_size=16,
        max_grain_size=32,
    ):
        assert target_fine_ratio + target_median_ratio <= 1.0
        self.target_fine_ratio = target_fine_ratio
        self.target_median_ratio = target_median_ratio
        self.gamma = gamma
        self.min_const = min_grain_size * min_grain_size
        self.median_const = median_grain_size * median_grain_size - self.min_const
        self.max_const = max_grain_size * max_grain_size - self.min_const

    def __call__(self, gate):
        # gate: (B, Hc, Wc, 3) — 0 coarse, 1 median, 2 fine
        g0, g1, g2 = gate[..., 0], gate[..., 1], gate[..., 2]
        beta_median = 1.0 * g0 + 4.0 * g1 + 1.0 * g2
        beta_median = beta_median.sum() / gate.shape[0] - self.min_const
        ratio_median = beta_median / self.median_const
        loss_median = (ratio_median - self.target_median_ratio) ** 2

        beta_fine = 1.0 * g0 + 16.0 * g2 + 1.0 * g1
        beta_fine = beta_fine.sum() / gate.shape[0] - self.min_const
        ratio_fine = beta_fine / self.max_const
        loss_fine = self.gamma * (ratio_fine - self.target_fine_ratio) ** 2
        return loss_fine + loss_median

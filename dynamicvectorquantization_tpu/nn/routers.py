"""Granularity routers: learned feature gates and fixed entropy thresholds.

Reference semantics:
  * `modules/dynamic_modules/RouterDual.py:6-57` — dual feature router
    (optional GroupNorm per head, AvgPool the fine map, concat channels,
    1- or 2-layer FC gate) and the fixed-entropy router (percentile-table
    threshold, hard one-hot gate, no gradients);
  * `modules/dynamic_modules/RouterTriple.py:6-56` — 3-way feature gate
    (fine pooled by 4, median by 2).

Gate layout is NHWC: (B, Hc, Wc, n_grains); grain 0 = coarsest.
"""
from __future__ import annotations

import json

import flax.linen as nn
import jax
import jax.numpy as jnp


def _load_threshold(json_path: str, fine_ratio: float) -> float:
    import os

    if not os.path.exists(json_path):
        # reference configs point at scripts/tools/thresholds/<name>.json;
        # fall back to the percentile tables shipped in assets/thresholds
        bundled = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets",
            "thresholds",
            os.path.basename(json_path),
        )
        if os.path.exists(bundled):
            json_path = bundled
    with open(json_path, "r", encoding="utf-8") as f:
        content = json.load(f)
    return float(content[str(int(100 - fine_ratio * 100))])


def _maybe_norm(normalization_type: str, name: str):
    if normalization_type == "none":
        return lambda x: x
    if "group" in normalization_type:
        num_groups = int(normalization_type.split("-")[-1])
        return nn.GroupNorm(num_groups=num_groups, epsilon=1e-6, name=name)
    raise NotImplementedError(normalization_type)


def _avg_pool(x, k: int):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class DualGrainFeatureRouter(nn.Module):
    num_channels: int
    normalization_type: str = "none"
    gate_type: str = "1layer-fc"

    @nn.compact
    def __call__(self, h_fine=None, h_coarse=None, entropy=None):
        h_fine = _maybe_norm(self.normalization_type, "feature_norm_fine")(h_fine)
        h_coarse = _maybe_norm(self.normalization_type, "feature_norm_coarse")(h_coarse)
        avg_fine = _avg_pool(h_fine, 2)
        feats = jnp.concatenate([h_coarse, avg_fine], axis=-1)
        if self.gate_type == "1layer-fc":
            gate = nn.Dense(2, name="gate")(feats)
        elif self.gate_type == "2layer-fc-SiLu":
            h = nn.Dense(self.num_channels * 2, name="gate_0")(feats)
            gate = nn.Dense(2, name="gate_2")(jax.nn.silu(h))
        else:
            raise NotImplementedError(self.gate_type)
        return gate  # (B, Hc, Wc, 2)


class DualGrainFixedEntropyRouter(nn.Module):
    """Hard gate from precomputed entropy percentile table (no gradients).

    ``fine_grain_ratito`` keeps the reference config schema's spelling
    (`configs/stage1/dqvae-entropy-dual-r05_imagenet.yml:22`)."""

    json_path: str = ""
    fine_grain_ratito: float | None = None
    fine_grain_ratio: float | None = None  # accepted alias
    threshold: float | None = None  # direct override (skips the JSON)

    def setup(self):
        if self.threshold is not None:
            self._threshold = float(self.threshold)
        else:
            ratio = (
                self.fine_grain_ratito
                if self.fine_grain_ratito is not None
                else self.fine_grain_ratio
            )
            self._threshold = _load_threshold(self.json_path, ratio)

    def __call__(self, h_fine=None, h_coarse=None, entropy=None):
        gate_fine = (entropy > self._threshold).astype(jnp.int32)
        gate = jnp.stack([1 - gate_fine, gate_fine], axis=-1)
        return gate  # (B, Hc, Wc, 2) one-hot int


class TripleGrainFeatureRouter(nn.Module):
    num_channels: int
    normalization_type: str = "none"
    gate_type: str = "1layer-fc"

    @nn.compact
    def __call__(self, h_fine=None, h_median=None, h_coarse=None, entropy=None):
        h_fine = _maybe_norm(self.normalization_type, "feature_norm_fine")(h_fine)
        h_median = _maybe_norm(self.normalization_type, "feature_norm_median")(h_median)
        h_coarse = _maybe_norm(self.normalization_type, "feature_norm_coarse")(h_coarse)
        avg_fine = _avg_pool(h_fine, 4)
        avg_median = _avg_pool(h_median, 2)
        feats = jnp.concatenate([h_coarse, avg_median, avg_fine], axis=-1)
        if self.gate_type == "1layer-fc":
            gate = nn.Dense(3, name="gate")(feats)
        elif self.gate_type == "2layer-fc-SiLu":
            h = nn.Dense(self.num_channels * 3, name="gate_0")(feats)
            gate = nn.Dense(3, name="gate_2")(jax.nn.silu(h))
        elif self.gate_type == "2layer-fc-ReLu":
            h = nn.Dense(self.num_channels * 3, name="gate_0")(feats)
            gate = nn.Dense(3, name="gate_2")(jax.nn.relu(h))
        else:
            raise NotImplementedError(self.gate_type)
        return gate  # (B, Hc, Wc, 3)


class TripleGrainFixedEntropyRouter(nn.Module):
    """Two-threshold entropy router for triple granularity (natural extension
    of the dual fixed-entropy router; the reference ships only the dual one)."""

    json_path: str = ""
    fine_grain_ratito: float | None = None
    median_grain_ratito: float | None = None
    fine_threshold: float | None = None
    median_threshold: float | None = None

    def setup(self):
        if self.fine_threshold is not None and self.median_threshold is not None:
            self._fine_t = float(self.fine_threshold)
            self._median_t = float(self.median_threshold)
        else:
            fine = self.fine_grain_ratito if self.fine_grain_ratito is not None else 0.3
            median = (
                self.median_grain_ratito if self.median_grain_ratito is not None else 0.3
            )
            self._fine_t = _load_threshold(self.json_path, fine)
            self._median_t = _load_threshold(self.json_path, fine + median)

    def __call__(self, h_fine=None, h_median=None, h_coarse=None, entropy=None):
        fine = (entropy > self._fine_t).astype(jnp.int32)
        median = ((entropy > self._median_t) & (entropy <= self._fine_t)).astype(jnp.int32)
        coarse = 1 - fine - median
        return jnp.stack([coarse, median, fine], axis=-1)

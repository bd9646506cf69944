"""YAML config loading with left-to-right merging and CLI dotlist overrides.

Reproduces the reference trainer's config behavior (`train.py:109-111` in the
reference): N base YAMLs are deep-merged left-to-right, then `key.path=value`
dotlist overrides are applied on top.  Implemented on plain PyYAML + dicts (no
OmegaConf dependency).
"""
from __future__ import annotations

import copy
from typing import Any, Iterable, Mapping

import yaml


def load_yaml(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def merge_configs(*configs: Mapping[str, Any]) -> dict:
    """Deep-merge mappings left-to-right (later values win)."""
    out: dict = {}
    for cfg in configs:
        out = _deep_merge(out, cfg)
    return out


def _deep_merge(base: Mapping[str, Any], other: Mapping[str, Any]) -> dict:
    out = dict(base)
    for k, v in other.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_value(text: str):
    return yaml.safe_load(text)


def apply_dotlist(config: dict, dotlist: Iterable[str]) -> dict:
    """Apply `a.b.c=value` overrides (values parsed as YAML scalars)."""
    out = copy.deepcopy(config)
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"Dotlist override must look like key=value, got {item!r}")
        key, _, raw = item.partition("=")
        node = out
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(raw)
    return out


def load_config(paths: Iterable[str], dotlist: Iterable[str] = ()) -> dict:
    cfg = merge_configs(*[load_yaml(p) for p in paths])
    if dotlist:
        cfg = apply_dotlist(cfg, dotlist)
    return cfg

"""Reflection-based instantiation from `{target, params}` config dicts.

Mirrors the reference's config surface (`utils/utils.py:41-51` in
CrossmodalGroup/DynamicVectorQuantization): every constructor in a YAML config
is a dotted `target` string plus a `params` mapping. Reference target strings
(e.g. ``modules.dynamic_modules.EncoderDual.DualGrainEncoder``) are remapped to
this package's classes via `config.registry.TARGET_ALIASES`, so the shipped
reference YAMLs work verbatim.
"""
from __future__ import annotations

import importlib
from typing import Any, Mapping


def get_obj_from_str(string: str, reload: bool = False):
    from ..config.registry import resolve_target

    string = resolve_target(string)
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: Mapping[str, Any]):
    if config is None:
        return None
    if "target" not in config:
        raise KeyError(f"Expected key `target` to instantiate, got {config!r}")
    params = dict(config.get("params") or {})
    return get_obj_from_str(config["target"])(**params)

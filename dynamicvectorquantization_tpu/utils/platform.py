"""Platform selection helper.

This image's axon PJRT plugin (sitecustomize) overrides jax's platform config
to "axon,cpu" at import time, so the standard `JAX_PLATFORMS` env var is
silently ignored. Entry points call `honor_jax_platforms_env()` right after
importing jax so `JAX_PLATFORMS=cpu python train.py ...` works as users
expect.
"""
from __future__ import annotations

import os


def honor_jax_platforms_env():
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        import jax

        try:
            if jax.config.jax_platforms != env:
                jax.config.update("jax_platforms", env)
        except Exception:
            pass

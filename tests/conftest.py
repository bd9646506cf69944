"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env before the first `import jax` anywhere in the test process.
"""
import os
import sys

# The image presets JAX_PLATFORMS=axon (tunneled TPU); tests must run local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon PJRT plugin (sitecustomize) calls
# jax.config.update("jax_platforms", "axon,cpu") on registration, overriding
# the env var — force it back to local CPU for the test suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)

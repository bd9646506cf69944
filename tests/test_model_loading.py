"""utils/model_loading.py: the shared sampling/serving checkpoint loader.

Regression (r04): `load_model_and_variables` initialized the frozen first
stage RANDOMLY instead of honoring `first_stage_config.params.ckpt_path` the
way the trainer does (train/loop.py `_load_first_stage`), so every sampled
grid / FID batch in the r04 product campaign decoded through an untrained
decoder. The reference resolves the same flag in its eval scripts
(`scripts/sample_val/sample_dynamic_uncond.py:40-55` upstream — the model
ctor calls init_from_ckpt on first_stage_config.params.ckpt_path).
"""
import os

import jax
import numpy as np
import pytest
import yaml

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SMOKE = os.path.join(_REPO, "configs/smoke/dqtransformer-uncond-tiny.yml")


def test_first_stage_ckpt_path_restored(tmp_path):
    import orbax.checkpoint as ocp

    from dynamicvectorquantization_tpu.config.yaml_config import load_config
    from dynamicvectorquantization_tpu.utils.instantiate import (
        instantiate_from_config,
    )
    from dynamicvectorquantization_tpu.utils.model_loading import (
        load_model_and_variables,
    )

    cfg = load_config([_SMOKE])
    fs_model = instantiate_from_config(cfg["model"]["params"]["first_stage_config"])
    fs_vars = fs_model.init(jax.random.PRNGKey(7))

    # Shift every param so the saved weights cannot collide with ANY fresh
    # init; save in the Stage1State field layout train/loop.py uses.
    shifted = jax.tree.map(lambda a: a + 1.0, fs_vars["params"])
    state = {"ae_params": shifted, "ema": fs_vars.get("ema", {})}
    ckroot = tmp_path / "s1" / "checkpoints"
    saver = ocp.StandardCheckpointer()
    saver.save(os.fspath(ckroot / "123"), state)
    saver.wait_until_finished()

    # Point the stage-2 config's first_stage ckpt_path at the checkpoints
    # ROOT (latest-step resolution is part of the contract).
    with open(_SMOKE) as f:
        raw = yaml.safe_load(f)
    raw["model"]["params"]["first_stage_config"]["params"]["ckpt_path"] = (
        os.fspath(ckroot)
    )
    ypath = tmp_path / "merged.yml"
    with open(ypath, "w") as f:
        yaml.safe_dump(raw, f)

    _, variables = load_model_and_variables(os.fspath(ypath), None, seed=0)

    got = jax.tree.leaves(variables["first_stage"]["params"])
    want = jax.tree.leaves(shifted)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))

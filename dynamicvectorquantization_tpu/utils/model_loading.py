"""Stage-2 model + variables loading shared by the sampling script, the
serving entry point, and tooling.

Resolves three checkpoint flavors the way the reference's eval scripts
expect a single `--model_path` flag to work
(`scripts/sample_val/sample_dynamic_uncond.py:40-55` upstream):
  * reference torch `.ckpt`/`.pth` -> `utils/torch_ckpt.py` converter
  * an orbax step dir (or a checkpoints root: picks the latest step)
  * None -> randomly initialized variables (smoke/testing)
"""
from __future__ import annotations

import os


def load_first_stage_variables(fs_model):
    """Load stage-1 weights for a frozen first stage from its config
    `ckpt_path`: orbax checkpoint (a step dir saved by train/loop.py, or a
    checkpoints/ root — latest step picked) or a reference torch .ckpt
    (reference `first_stage_config.params.ckpt_path`). Shared by the trainer
    and by this sampling/serving loader — r04 bug: the sampling path used a
    randomly-initialized first stage, so every sampled grid decoded through
    untrained weights."""
    path = str(fs_model.ckpt_path)
    if path.endswith((".ckpt", ".pth", ".pt")):
        from .torch_ckpt import load_dqvae_checkpoint

        return load_dqvae_checkpoint(path)
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # accept the checkpoints/ root (pick latest step) and descend into the
    # CheckpointManager item dir ("default")
    if os.path.isdir(path) and not os.path.exists(os.path.join(path, "_METADATA")):
        steps = sorted((d for d in os.listdir(path) if d.isdigit()), key=int)
        if steps:
            path = os.path.join(path, steps[-1])
        if os.path.exists(os.path.join(path, "default", "_METADATA")):
            path = os.path.join(path, "default")
    restored = ocp.StandardCheckpointer().restore(path)
    # Stage1State pytree (saved by train/loop.py) -> flax variables
    if isinstance(restored, dict) and "ae_params" in restored:
        return {"params": restored["ae_params"], "ema": restored["ema"]}
    if isinstance(restored, (list, tuple)) and len(restored) >= 3:
        return {"params": restored[0], "ema": restored[2]}
    return restored


def load_model_and_variables(yaml_path, model_path=None, seed=0,
                             kv_cache_dtype=None):
    import jax

    from ..config.yaml_config import load_config
    from .instantiate import instantiate_from_config

    config = load_config([yaml_path])
    if kv_cache_dtype:
        config["model"]["params"]["transformer_config"]["params"][
            "kv_cache_dtype"
        ] = kv_cache_dtype
    model = instantiate_from_config(config["model"])

    if model_path and model_path.endswith((".ckpt", ".pth", ".pt")):
        from .torch_ckpt import load_dualformer_checkpoint

        variables = load_dualformer_checkpoint(model_path)
    else:
        fs_model = model.first_stage_model
        if fs_model.ckpt_path and os.path.exists(str(fs_model.ckpt_path)):
            fs_vars = load_first_stage_variables(fs_model)
        else:
            fs_vars = fs_model.init(jax.random.PRNGKey(seed))
        variables = model.init(jax.random.PRNGKey(seed + 1), fs_vars)
        if model_path:  # orbax (Stage2State saved by train/loop.py)
            import orbax.checkpoint as ocp

            path = os.path.abspath(model_path)
            if os.path.isdir(path) and not os.path.exists(
                os.path.join(path, "_METADATA")
            ):
                steps = sorted(
                    (d for d in os.listdir(path) if d.isdigit()), key=int
                )
                if steps:
                    path = os.path.join(path, steps[-1])
                if os.path.exists(os.path.join(path, "default", "_METADATA")):
                    path = os.path.join(path, "default")
            state = ocp.StandardCheckpointer().restore(path)
            if isinstance(state, dict) and "params" in state:
                variables["transformer"]["params"] = state["params"]
            elif isinstance(state, (list, tuple)):
                variables["transformer"]["params"] = state[0]
    return model, variables

#!/usr/bin/env python3
"""Stage-2 (DQ-Transformer) training-step throughput at production geometry.

Full p6c18 StackGPT over a frozen full-size DQ-VAE: frozen encode + permuter
pack + 24-layer forward/backward + AdamW. Sequence capacity defaults to the
r=0.5 regime (coarse 161 / fine 645 incl. prefix, ~808 tokens).

Env: DQVQ_BENCH_S2_BATCH (default 8), DQVQ_BENCH_S2_ITERS (default 3),
DQVQ_BENCH_S2_FLASH=1 enables the Pallas flash-attention training path.
DQVQ_BENCH_S2_CACHED=1 measures the cached-codes production mode
(Stage2Trainer.encode_dataset once, then token-stream train steps via
`forward_tokens` — the mode the 10k-step campaign ran): the frozen
first-stage conv encode leaves the step entirely.
"""
import json
import numpy as np
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dynamicvectorquantization_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()

    import jax
    import jax.numpy as jnp

    from dynamicvectorquantization_tpu.config.yaml_config import load_config
    from dynamicvectorquantization_tpu.utils.instantiate import instantiate_from_config
    from dynamicvectorquantization_tpu.train.stage2 import Stage2Trainer

    batch = int(os.environ.get("DQVQ_BENCH_S2_BATCH", "8"))
    iters = int(os.environ.get("DQVQ_BENCH_S2_ITERS", "10"))
    use_flash = os.environ.get("DQVQ_BENCH_S2_FLASH", "0") == "1"
    cached = os.environ.get("DQVQ_BENCH_S2_CACHED", "0") == "1"
    accum = int(os.environ.get("DQVQ_BENCH_S2_ACCUM", "1"))
    # K>1: K full optimizer steps per dispatch (Stage2Trainer.train_steps)
    steps_per_call = int(os.environ.get("DQVQ_BENCH_S2_STEPS_PER_CALL", "1"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config([os.path.join(repo, "configs/stage2/uncond_imagenet_p6c18.yml")])
    params = cfg["model"]["params"]
    params["first_stage_config"]["params"]["ckpt_path"] = None
    params["permuter_config"]["params"]["coarse_max_len"] = 160
    params["permuter_config"]["params"]["fine_max_len"] = 644
    params["transformer_config"]["params"]["use_flash_attention"] = use_flash

    model = instantiate_from_config(cfg["model"])
    dtype = os.environ.get("DQVQ_BENCH_S2_DTYPE", "bfloat16")
    trainer = Stage2Trainer(model, learning_rate=5e-4, warmup_steps=0,
                            max_steps=10_000, accum=accum,
                            compute_dtype=None if dtype == "float32" else dtype)

    fs_vars = model.first_stage_model.init(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), fs_vars)
    state = trainer.init_state(variables)

    shape = ((batch, 256, 256, 3) if accum == 1
             else (accum, batch, 256, 256, 3))
    if steps_per_call > 1:
        shape = (steps_per_call,) + shape
        many = jax.jit(trainer.train_steps, donate_argnums=(0,))
        step = lambda s, v, xi, ci, r: many(s, v, xi, None, r)
    else:
        step = jax.jit(trainer.train_step, donate_argnums=(0,))
    if cached:
        assert accum == 1, "cached-codes mode supports accum=1"
        imgs = jax.random.uniform(
            jax.random.PRNGKey(2), (steps_per_call * batch, 256, 256, 3),
            minval=-1, maxval=1,
        )
        z = trainer.encode_dataset(variables, np.asarray(imgs))
        x = {
            k: jnp.asarray(v).reshape(
                (steps_per_call, batch) + v.shape[1:]
            ) if steps_per_call > 1 else jnp.asarray(v)
            for k, v in z.items()
        }
        perturb = lambda xi, i: xi  # int token streams; nothing to nudge
    else:
        x = jax.random.uniform(jax.random.PRNGKey(2), shape, minval=-1,
                               maxval=1)
        perturb = lambda xi, i: xi + jnp.float32(i) * 1e-8

    t0 = time.perf_counter()
    state, logs = step(state, variables, x, x, jax.random.PRNGKey(3))
    float(np.ravel(np.asarray(logs["train_loss"]))[-1])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # the first few post-compile dispatches through the axon tunnel are slow
    # (QUIRKS: timing methodology) — warm up before timing
    for w in range(2):
        state, logs = step(state, variables, x, x, jax.random.PRNGKey(100 + w))
    float(np.ravel(np.asarray(logs["train_loss"]))[-1])

    t0 = time.perf_counter()
    for i in range(iters):
        state, logs = step(state, variables, perturb(x, i), x,
                           jax.random.PRNGKey(4 + i))
    float(np.ravel(np.asarray(logs["train_loss"]))[-1])
    dt = time.perf_counter() - t0
    ips = steps_per_call * accum * batch * iters / dt
    print(json.dumps({
        "metric": "dqtransformer_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "config": {"batch": batch, "flash": use_flash, "dtype": dtype,
                   "accum": accum, "steps_per_call": steps_per_call,
                   "cached_codes": cached,
                   "loss": round(float(np.ravel(logs["train_loss"])[-1]), 4)},
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Stage-1 training-step throughput at production geometry.

Runs the full GAN train step (entropy + encoder + Pallas VQ/EMA + decoder +
LPIPS + adaptive disc weight + both optimizer updates) at 256x256 with the
flagship widths (ch=128, z=256, codebook 1024) on the local accelerator.

Env: DQVQ_BENCH_TRAIN_BATCH (default 16), DQVQ_BENCH_TRAIN_ITERS (default 5),
DQVQ_BENCH_TRAIN_REMAT=1, DQVQ_BENCH_TRAIN_DTYPE=bfloat16|float32.
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

    from __graft_entry__ import _dual_config
    from dynamicvectorquantization_tpu.models.dqvae import DualGrainVQModel
    from dynamicvectorquantization_tpu.train.stage1 import Stage1Trainer

    batch = int(os.environ.get("DQVQ_BENCH_TRAIN_BATCH", "16"))
    iters = int(os.environ.get("DQVQ_BENCH_TRAIN_ITERS", "5"))
    # K>1: K full GAN steps per dispatch (Stage1Trainer.train_steps)
    steps_per_call = int(os.environ.get("DQVQ_BENCH_TRAIN_STEPS_PER_CALL", "1"))
    remat = os.environ.get("DQVQ_BENCH_TRAIN_REMAT", "1") == "1"
    dtype = os.environ.get("DQVQ_BENCH_TRAIN_DTYPE", "bfloat16")

    cfg = _dual_config(256, ch=128, z_ch=256, codebook=1024)
    if dtype != "float32":
        cfg["compute_dtype"] = dtype
    cfg["lossconfig"] = {
        "target": "modules.losses.vqperceptual_multidisc.VQLPIPSWithDiscriminator",
        "params": {
            "disc_start": 0,
            "disc_config": {
                "target": "modules.discriminator.model.NLayerDiscriminator",
                "params": {"input_nc": 3, "ndf": 64, "n_layers": 3},
            },
            "disc_init": True,
            "disc_weight_max": 0.75,
        },
    }
    model = DualGrainVQModel(**cfg)
    trainer = Stage1Trainer(model, learning_rate=1e-4, warmup_steps=0,
                            max_steps=10_000, remat=remat)

    shape = ((batch, 256, 256, 3) if steps_per_call == 1
             else (steps_per_call, batch, 256, 256, 3))
    x = jax.random.uniform(jax.random.PRNGKey(0), shape, minval=-1, maxval=1)
    state = trainer.init_state(jax.random.PRNGKey(1),
                               x[:1] if steps_per_call == 1 else x[0, :1])
    if steps_per_call > 1:
        step = jax.jit(trainer.train_steps, donate_argnums=(0,))
    else:
        step = jax.jit(trainer.train_step, donate_argnums=(0,))

    t0 = time.perf_counter()
    state, logs = step(state, x, jax.random.PRNGKey(2))
    float(np.ravel(np.asarray(logs["train_aeloss"]))[-1])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # first post-compile dispatches are slow on the axon tunnel (QUIRKS #24)
    for w in range(2):
        state, logs = step(state, x + jnp.float32(w) * 1e-8, jax.random.PRNGKey(97 + w))
    float(np.ravel(np.asarray(logs["train_aeloss"]))[-1])

    t0 = time.perf_counter()
    for i in range(iters):
        state, logs = step(state, x + jnp.float32(i) * 1e-8, jax.random.PRNGKey(3 + i))
    float(np.ravel(np.asarray(logs["train_aeloss"]))[-1])
    dt = time.perf_counter() - t0
    ips = steps_per_call * batch * iters / dt
    print(json.dumps({
        "metric": "dqvae_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "config": {"batch": batch, "remat": remat, "dtype": dtype,
                   "aeloss": round(float(np.ravel(np.asarray(logs["train_aeloss"]))[-1]), 4)},
    }))


if __name__ == "__main__":
    main()

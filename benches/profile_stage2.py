#!/usr/bin/env python3
"""Trace stage-2 train steps and print the top device ops (op_profile).

Writes a jax.profiler trace for a few post-warmup steps, then parses the
xplane directly (tensorflow.tsl protos) and prints the self-time ranking —
the tool that located the dropout-PRNG and attention-materialization costs.

Env: DQVQ_BENCH_S2_BATCH (default 8), DQVQ_BENCH_S2_DTYPE (default
bfloat16), DQVQ_PROFILE_DIR (default /tmp/s2_profile).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dynamicvectorquantization_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()

    import jax

    from dynamicvectorquantization_tpu.config.yaml_config import load_config
    from dynamicvectorquantization_tpu.utils.instantiate import instantiate_from_config
    from dynamicvectorquantization_tpu.train.stage2 import Stage2Trainer

    batch = int(os.environ.get("DQVQ_BENCH_S2_BATCH", "8"))
    dtype = os.environ.get("DQVQ_BENCH_S2_DTYPE", "bfloat16")
    logdir = os.environ.get("DQVQ_PROFILE_DIR", "/tmp/s2_profile")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config([os.path.join(repo, "configs/stage2/uncond_imagenet_p6c18.yml")])
    params = cfg["model"]["params"]
    params["first_stage_config"]["params"]["ckpt_path"] = None
    params["permuter_config"]["params"]["coarse_max_len"] = 160
    params["permuter_config"]["params"]["fine_max_len"] = 644
    if os.environ.get("DQVQ_BENCH_S2_FLASH", "0") == "1":
        params["transformer_config"]["params"]["use_flash_attention"] = True

    model = instantiate_from_config(cfg["model"])
    trainer = Stage2Trainer(model, learning_rate=5e-4, warmup_steps=0,
                            max_steps=10_000,
                            compute_dtype=None if dtype == "float32" else dtype)
    fs_vars = model.first_stage_model.init(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), fs_vars)
    state = trainer.init_state(variables)
    if os.environ.get("DQVQ_BENCH_S2_CACHED", "0") == "1":
        # cached-codes production mode: encode once, profile the pure
        # token-stream train step (Stage2Trainer.encode_dataset +
        # model.forward_tokens) — the mode the 10k campaign ran.
        import numpy as np

        imgs = jax.random.uniform(jax.random.PRNGKey(2),
                                  (batch, 256, 256, 3), minval=-1, maxval=1)
        z = trainer.encode_dataset(variables, np.asarray(imgs))
        import jax.numpy as jnp
        x = {k: jnp.asarray(v) for k, v in z.items()}
    else:
        x = jax.random.uniform(jax.random.PRNGKey(2), (batch, 256, 256, 3),
                               minval=-1, maxval=1)
    step = jax.jit(trainer.train_step, donate_argnums=(0,))

    # DQVQ_PROFILE_HLO=1: map every `fusion.N` trace op to its root HLO
    # instruction so the generic "fusion" bucket decomposes into what the
    # elementwise work actually IS (dropout-mask applies, residual adds,
    # dGELU, CE softmax, ...). The compiled module's fusion computation
    # roots carry the answer; the trace only carries the fusion's name.
    fusion_roots = None
    if os.environ.get("DQVQ_PROFILE_HLO", "0") == "1":
        from benches._xplane import fusion_roots_from_hlo

        # compile ONCE via AOT and reuse the executable for the warmup/trace
        # loop below — lower().compile() followed by step(...) would compile
        # the program a second time (minutes of wasted wall-clock on TPU)
        compiled = step.lower(state, variables, x, x, jax.random.PRNGKey(3)).compile()
        fusion_roots = fusion_roots_from_hlo(compiled.as_text())
        step = compiled
    for i in range(3):  # compile + warmup
        state, logs = step(state, variables, x, x, jax.random.PRNGKey(3 + i))
    float(logs["train_loss"])
    print("warm; tracing...", file=sys.stderr)

    with jax.profiler.trace(logdir):
        for i in range(3):
            state, logs = step(state, variables, x, x, jax.random.PRNGKey(7 + i))
        float(logs["train_loss"])

    from benches._xplane import analyze

    analyze(logdir, fusion_roots=fusion_roots)


if __name__ == "__main__":
    main()

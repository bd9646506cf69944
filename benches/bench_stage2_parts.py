#!/usr/bin/env python3
"""Stage-2 train-step component bisection at production geometry.

Times, separately jitted (warmup 2, 10 chained iters each, one host
materialization — QUIRKS #24):
  * encode:   frozen DQ-VAE encode + permuter pack (encode_to_z)
  * fwd:      full model.forward + loss (no grad)
  * fwd+bwd:  value_and_grad of the loss
  * step:     full train_step (fwd+bwd + AdamW + pad-row freeze)

Env: DQVQ_BENCH_S2_BATCH (default 8), DQVQ_BENCH_S2_DTYPE
(bfloat16|float32, default bfloat16).
"""
import json
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
    dtype = os.environ.get("DQVQ_BENCH_S2_DTYPE", "bfloat16")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config([os.path.join(repo, "configs/stage2/uncond_imagenet_p6c18.yml")])
    params = cfg["model"]["params"]
    params["first_stage_config"]["params"]["ckpt_path"] = None
    params["permuter_config"]["params"]["coarse_max_len"] = 160
    params["permuter_config"]["params"]["fine_max_len"] = 644

    model = instantiate_from_config(cfg["model"])
    trainer = Stage2Trainer(model, learning_rate=5e-4, warmup_steps=0,
                            max_steps=10_000,
                            compute_dtype=None if dtype == "float32" else dtype)

    fs_vars = model.first_stage_model.init(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), fs_vars)
    state = trainer.init_state(variables)
    x = jax.random.uniform(jax.random.PRNGKey(2), (batch, 256, 256, 3),
                           minval=-1, maxval=1)

    cd = trainer.compute_dtype

    def cast(tree):
        if cd is None:
            return tree
        return jax.tree_util.tree_map(
            lambda a: a.astype(cd)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)

    v_c = {"transformer": {**variables["transformer"],
                           "params": cast(state.params)},
           "first_stage": cast(variables["first_stage"])}

    def encode_fn(v, xi):
        _, z = model.encode_to_z(v, xi)
        return z["coarse_content"], z["fine_content"]

    def fwd_fn(v, xi, ri):
        out = model.forward(v, xi, xi, train=True, rngs={"dropout": ri})
        return model.loss(out)

    def fwdbwd_fn(params, xi, ri):
        def lf(p):
            v = {"transformer": {**variables["transformer"], "params": cast(p)},
                 "first_stage": v_c["first_stage"]}
            out = model.forward(v, xi, cast(xi), train=True,
                                rngs={"dropout": ri})
            return model.loss(out)
        val, g = jax.value_and_grad(lf)(params)
        return val, jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), g, 0.0)

    def bench(name, fn, *args):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        r = f(*args)
        jax.tree_util.tree_map(
            lambda a: float(jnp.sum(a.astype(jnp.float32))), r)
        print(f"{name}: compile {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        for _ in range(2):
            r = f(*args)
        jax.tree_util.tree_map(
            lambda a: float(jnp.sum(a.astype(jnp.float32))), r)
        t0 = time.perf_counter()
        for _ in range(10):
            r = f(*args)
        jax.tree_util.tree_map(
            lambda a: float(jnp.sum(a.astype(jnp.float32))), r)
        ms = (time.perf_counter() - t0) / 10 * 1e3
        return round(ms, 2)

    rng = jax.random.PRNGKey(3)
    res = {
        "encode_ms": bench("encode", encode_fn, cast(variables), cast(x)),
        "fwd_ms": bench("fwd", fwd_fn, v_c, cast(x), rng),
        "fwdbwd_ms": bench("fwdbwd", fwdbwd_fn, state.params, cast(x), rng),
    }

    def step_fn(s, xi, ri):
        return trainer.train_step(s, variables, xi, xi, ri)

    f = jax.jit(step_fn, donate_argnums=(0,))
    t0 = time.perf_counter()
    state, logs = f(state, x, rng)
    float(logs["train_loss"])
    print(f"step: compile {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    for i in range(2):
        state, logs = f(state, x, jax.random.PRNGKey(5 + i))
    float(logs["train_loss"])
    t0 = time.perf_counter()
    for i in range(10):
        state, logs = f(state, x, jax.random.PRNGKey(10 + i))
    float(logs["train_loss"])
    res["step_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)

    res.update({"batch": batch, "dtype": dtype,
                "img_per_s": round(batch / (res["step_ms"] / 1e3), 2)})
    print(json.dumps(res))


if __name__ == "__main__":
    main()

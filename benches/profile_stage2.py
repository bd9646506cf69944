#!/usr/bin/env python3
"""Trace stage-2 train steps and print the top device ops (op_profile).

Writes a jax.profiler trace for a few post-warmup steps, then parses the
xplane with tensorboard_plugin_profile and prints the self-time ranking —
the tool that located the dropout-PRNG and attention-materialization costs.

Env: DQVQ_BENCH_S2_BATCH (default 8), DQVQ_BENCH_S2_DTYPE (default
bfloat16), DQVQ_PROFILE_DIR (default /tmp/s2_profile).
"""
import glob
import gzip
import json
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
    x = jax.random.uniform(jax.random.PRNGKey(2), (batch, 256, 256, 3),
                           minval=-1, maxval=1)
    step = jax.jit(trainer.train_step, donate_argnums=(0,))

    for i in range(3):  # compile + warmup
        state, logs = step(state, variables, x, x, jax.random.PRNGKey(3 + i))
    float(logs["train_loss"])
    print("warm; tracing...", file=sys.stderr)

    with jax.profiler.trace(logdir):
        for i in range(3):
            state, logs = step(state, variables, x, x, jax.random.PRNGKey(7 + i))
        float(logs["train_loss"])

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print(json.dumps({"error": "no xplane captured", "logdir": logdir}))
        return
    xplane = max(xplanes, key=os.path.getmtime)
    print(f"xplane: {xplane}", file=sys.stderr)

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    # framework_op_stats arrives as gviz JSON; fall back to printing raw head
    try:
        tbl = json.loads(data)
        cols = [c["label"] for c in tbl["cols"]]
        rows = [[c.get("v") for c in r["c"]] for r in tbl["rows"]]
        i_name = cols.index("Operation")
        i_self = next(i for i, c in enumerate(cols) if "self-time" in c.lower())
        i_occ = next((i for i, c in enumerate(cols)
                      if "occurrences" in c.lower()), None)
        rows.sort(key=lambda r: -(r[i_self] or 0))
        total = sum(r[i_self] or 0 for r in rows)
        print(f"{'self_us':>12}  {'%':>5}  {'n':>5}  op")
        for r in rows[:25]:
            pct = 100 * (r[i_self] or 0) / max(total, 1)
            occ = r[i_occ] if i_occ is not None else "-"
            print(f"{r[i_self]:>12.0f}  {pct:>5.1f}  {occ:>5}  {r[i_name][:90]}")
        print(f"total self-time: {total/1e3:.1f} ms over traced steps")
    except Exception as e:
        print(f"parse fallback ({e}); raw head:")
        print(data[:3000])


if __name__ == "__main__":
    main()

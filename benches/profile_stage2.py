#!/usr/bin/env python3
"""Trace stage-2 train steps and print the top device ops (op_profile).

Writes a jax.profiler trace for a few post-warmup steps, then parses the
xplane directly (tensorflow.tsl protos) and prints the self-time ranking —
the tool that located the dropout-PRNG and attention-materialization costs.

Env: DQVQ_BENCH_S2_BATCH (default 8), DQVQ_BENCH_S2_DTYPE (default
bfloat16), DQVQ_PROFILE_DIR (default /tmp/s2_profile).
"""
import glob
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
    fusion_roots = {}
    if os.environ.get("DQVQ_PROFILE_HLO", "0") == "1":
        import re as _re

        # compile ONCE via AOT and reuse the executable for the warmup/trace
        # loop below — lower().compile() followed by step(...) would compile
        # the program a second time (minutes of wasted wall-clock on TPU)
        compiled = step.lower(state, variables, x, x, jax.random.PRNGKey(3)).compile()
        txt = compiled.as_text()
        step = compiled
        # computation bodies are named `%fused_computation[.N]`; the fusion
        # instruction that calls one is named `%fusion[.N]` and states
        # calls=<computation>. Grab each fusion's called computation root.
        comp_root = {}
        cur = None
        for ln in txt.splitlines():
            # computation headers may carry an `ENTRY ` prefix (`ENTRY %main
            # (...)`); match it so ENTRY's ROOT doesn't get attributed to the
            # previous computation
            m = _re.match(r"(?:ENTRY )?%?([\w.-]+) \(", ln.strip())
            if ln and not ln.startswith(" ") and "{" in ln and m:
                cur = m.group(1)
            if ln and not ln.startswith(" ") and ln.strip() == "}":
                cur = None  # computation closed; ignore stray ROOT lines
            s = ln.strip()
            if s.startswith("ROOT ") and cur:
                # `ROOT %name = type op(...)`
                mm = _re.match(r"ROOT %?[\w.-]+ = \S+ ([\w-]+)", s)
                if mm:
                    comp_root[cur] = mm.group(1)
        for mm in _re.finditer(
            r"%?(fusion[\w.]*) = (\S+) fusion\(.*?calls=%?([\w.-]+)", txt
        ):
            fusion_roots[mm.group(1)] = (
                f"{comp_root.get(mm.group(3), '?')} {mm.group(2)}"
            )

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

    # Parse the xplane directly (tensorflow.tsl protos; the
    # tensorboard_plugin_profile converter needs a protoc/pywrap pairing this
    # image doesn't ship). The TPU device plane's "XLA Ops" line holds
    # non-overlapping leaf op events; "Steps" holds one event per dispatched
    # step — real train steps are the >1 ms ones (tiny events are the log
    # fetches).
    import collections
    import re

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        xs.ParseFromString(f.read())
    planes = [
        pl for pl in xs.planes
        if pl.name.startswith("/device:") and pl.lines
    ]
    if not planes:
        print(json.dumps({"error": "no device plane", "xplane": xplane}))
        return
    # prefer the accelerator plane over e.g. /device:CUSTOM:Megascale Trace
    plane = next((pl for pl in planes if "TPU" in pl.name), planes[0])
    md = plane.event_metadata
    ops = next(l for l in plane.lines if l.name == "XLA Ops")
    steps_line = next((l for l in plane.lines if l.name == "Steps"), None)
    nsteps = (
        sum(1 for e in steps_line.events if e.duration_ps > 1e9)
        if steps_line is not None else 1
    ) or 1

    # stat metadata: resolve the "hlo_category" stat id so generic "fusion"
    # ops can be split into matmul ("convolution fusion") vs elementwise
    # ("loop/input/output fusion") buckets — the MXU-share number VERDICT
    # r02 asks for.
    smd = plane.stat_metadata
    cat_ids = {i for i, s in smd.items() if s.name == "hlo_category"}

    by_op = collections.Counter()
    by_family = collections.Counter()
    n_family = collections.Counter()
    by_cat = collections.Counter()
    for e in ops.events:
        m = md[e.metadata_id]
        name = m.display_name or m.name
        by_op[name] += e.duration_ps
        fam = re.sub(r"[.\d]+$", "", name)
        by_family[fam] += e.duration_ps
        n_family[fam] += 1
        cat = ""
        for st in e.stats:
            if st.metadata_id in cat_ids:
                cat = st.str_value
                break
        by_cat[cat or "?"] += e.duration_ps
    total = sum(by_op.values())

    print(f"{'ms/step':>8}  {'%':>5}  hlo_category")
    for cat, ps in by_cat.most_common(12):
        print(f"{ps / 1e9 / nsteps:8.2f}  {100 * ps / total:5.1f}  {cat}")
    print()

    print(f"{'ms/step':>8}  {'%':>5}  {'n':>6}  op family "
          f"({nsteps} real steps traced)")
    for fam, ps in by_family.most_common(20):
        print(f"{ps / 1e9 / nsteps:8.2f}  {100 * ps / total:5.1f}  "
              f"{n_family[fam]:6}  {fam[:90]}")
    print(f"\n{'ms/step':>8}  {'%':>5}  top individual ops")
    for name, ps in by_op.most_common(15):
        print(f"{ps / 1e9 / nsteps:8.2f}  {100 * ps / total:5.1f}  {name[:90]}")

    if fusion_roots:
        by_root = collections.Counter()
        n_root = collections.Counter()
        unmatched = 0
        for name, ps in by_op.items():
            if not name.startswith("fusion"):
                continue
            root = fusion_roots.get(name)
            if root is None:
                unmatched += ps
                continue
            by_root[root] += ps
            n_root[root] += 1
        print(f"\n{'ms/step':>8}  {'%':>5}  {'n':>4}  fusion bucket by "
              f"(root op, output shape)")
        for root, ps in by_root.most_common(25):
            print(f"{ps / 1e9 / nsteps:8.2f}  {100 * ps / total:5.1f}  "
                  f"{n_root[root]:4}  {root[:100]}")
        if unmatched:
            print(f"{unmatched / 1e9 / nsteps:8.2f}  {100 * unmatched / total:5.1f}"
                  f"     (trace fusion names not found in compiled HLO)")
    print(f"total device time: {total / 1e9 / nsteps:.1f} ms/step")


if __name__ == "__main__":
    main()

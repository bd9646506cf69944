#!/usr/bin/env python3
"""Run the three measured paths (encode / stage-2 train / generation) on the
chip and cache their headline numbers in artifacts/bench_extra.json.

`bench.py` folds this cache into its one-line JSON so the driver-recorded
BENCH_r*.json carries all three metrics (BASELINE.md names encode AND
sample; VERDICT r02 #7) without paying three cold compiles (~8 min each on
this host) inside the driver's bench window. Refresh by re-running this
script whenever the hot paths change; bench.py tags the values with this
run's git rev + timestamp so staleness is visible.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, env=None):
    e = dict(os.environ)
    e.update(env or {})
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benches", script)],
        env=e, capture_output=True, text=True, timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"{script}: no JSON line\n{out.stdout}\n{out.stderr}")


def main():
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                         capture_output=True, text=True).stdout.strip()
    results = {"git_rev": rev, "unix_time": int(time.time())}

    t0 = time.time()
    s2 = _run("bench_train_stage2.py", {
        "DQVQ_BENCH_S2_FLASH": "1", "DQVQ_BENCH_S2_STEPS_PER_CALL": "4",
        "DQVQ_BENCH_S2_ITERS": "8",
    })
    results["stage2_train_ips"] = s2["value"]
    print(f"stage2 train: {s2['value']} img/s ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    t0 = time.time()
    # K=8 matches the product default (train.py cached-codes auto dispatch)
    s2c = _run("bench_train_stage2.py", {
        "DQVQ_BENCH_S2_FLASH": "1", "DQVQ_BENCH_S2_STEPS_PER_CALL": "8",
        "DQVQ_BENCH_S2_ITERS": "6", "DQVQ_BENCH_S2_CACHED": "1",
    })
    results["stage2_train_cached_ips"] = s2c["value"]
    print(f"stage2 train (cached codes): {s2c['value']} img/s "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)

    t0 = time.time()
    gen = _run("bench_sample.py", {"DQVQ_BENCH_SAMPLE_BATCH": "128",
                                   "DQVQ_BENCH_SAMPLE_KV": "int8"})
    results["generation_ips"] = gen["value"]
    results["generation_vs_reference_est"] = gen.get("vs_reference_est")
    print(f"generation: {gen['value']} img/s ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    path = os.path.join(REPO, "artifacts", "bench_extra.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Offline entropy-threshold percentile tables for the fixed-entropy router.

Reference: `scripts/tools/calculate_entropy_thresholds.py:27-110` — compute
per-patch entropy over the whole dataset, sort, take percentiles 1..99 ->
JSON {"1": t1, ..., "99": t99} consumed by DualGrainFixedEntropyRouter.

Convention note (SURVEY.md §7.1.3): the reference's offline tool binned over
linspace(0, 1, 32) while the in-model entropy bins over linspace(-1, 1, 32).
This tool defaults to the IN-MODEL convention (so tables and model agree);
pass --legacy_bins to reproduce the reference tool's tables.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def main():
    from dynamicvectorquantization_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="synthetic",
                   choices=["imagenet", "ffhq", "synthetic"])
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--legacy_bins", action="store_true",
                   help="linspace(0,1,32) bins like the reference tool")
    p.add_argument("--out_dir", type=str,
                   default=os.path.join(os.path.dirname(__file__), "thresholds"))
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynamicvectorquantization_tpu.data import datasets
    from dynamicvectorquantization_tpu.data.pipeline import PrefetchLoader
    from dynamicvectorquantization_tpu.ops.entropy import patch_entropy

    if opt.dataset == "imagenet":
        ds = (datasets.ImageNetTrain if opt.split == "train" else
              datasets.ImageNetValidation)({"size": opt.image_size, "is_eval": True})
    elif opt.dataset == "ffhq":
        ds = (datasets.FFHQTrain if opt.split == "train" else
              datasets.FFHQValidation)(size=opt.image_size)
    else:
        ds = datasets.SyntheticDataset(size=opt.image_size, length=512)

    loader = PrefetchLoader(ds, batch_size=opt.batch_size, shuffle=False)
    bin_range = (0.0, 1.0) if opt.legacy_bins else (-1.0, 1.0)

    entropy_fn = jax.jit(
        lambda x: patch_entropy(x, opt.patch_size, bin_range=bin_range)
    )
    all_entropy = []
    for bi, batch in enumerate(loader.epoch(0)):
        if opt.max_batches and bi >= opt.max_batches:
            break
        e = np.asarray(entropy_fn(jnp.asarray(batch["image"])))
        all_entropy.append(e.reshape(-1))
        print(f"\r batch {bi}", end="")
    print()

    values = np.sort(np.concatenate(all_entropy))
    thresholds = {
        str(i): float(values[min(int(len(values) * i / 100), len(values) - 1)])
        for i in range(1, 100)
    }
    os.makedirs(opt.out_dir, exist_ok=True)
    out = os.path.join(
        opt.out_dir,
        f"entropy_thresholds_{opt.dataset}_{opt.split}_patch-{opt.patch_size}.json",
    )
    with open(out, "w") as f:
        json.dump(thresholds, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

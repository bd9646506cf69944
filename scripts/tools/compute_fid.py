#!/usr/bin/env python3
"""FID / rFID from sample dumps or image folders.

Completes the reference's evaluation flow (it dumps samples with
`scripts/sample_val/*` and runs pytorch-fid externally) inside this repo:

  # FID: sampler dumps vs a data folder
  python3 scripts/tools/compute_fid.py --a /tmp/samples/numpys --b /data/val

  # rFID: reconstructions of a stage-1 model vs its inputs
  python3 scripts/tools/compute_fid.py --rfid \
      --yaml_path configs/stage1/dqvae-entropy-dual-r05_imagenet.yml \
      --model_path <ckpt> --b /data/val

Features: real InceptionV3 pool3 when DQVQ_INCEPTION_WEIGHTS points at a
torchvision state_dict (required for numbers comparable to the paper).
``--proxy_features`` substitutes a fixed seeded random-projection extractor —
that mode VALIDATES THE PLUMBING ONLY (monotone in distribution distance but
not comparable to published FID); the output metric is named "proxy_fid" and
a warning is printed, so it can never masquerade as real FID.
"""
import argparse
import glob
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def iter_source(path, batch_size=32, limit=None, size=None):
    """Yield (B, H, W, 3) float batches in [-1, 1] from .pkl dumps, .npy
    files, or an image folder."""
    from PIL import Image

    pkls = sorted(glob.glob(os.path.join(path, "*.pkl")))
    npys = sorted(glob.glob(os.path.join(path, "*.npy")))
    imgs = sorted(
        p for p in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if p.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    n = 0

    def to_float(arr):
        arr = np.asarray(arr)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 127.5 - 1.0
        return arr.astype(np.float32)

    if pkls or npys:
        for p in pkls + npys:
            arr = (pickle.load(open(p, "rb")) if p.endswith(".pkl")
                   else np.load(p))
            arr = to_float(arr)
            if arr.ndim == 3:
                arr = arr[None]
            for i in range(0, len(arr), batch_size):
                if limit and n >= limit:
                    return
                chunk = arr[i : i + batch_size]
                n += len(chunk)
                yield chunk
        return

    buf = []
    for p in imgs:
        if limit and n >= limit:
            break
        im = Image.open(p).convert("RGB")
        if size:
            im = im.resize((size, size), Image.BICUBIC)
        buf.append(to_float(np.asarray(im, np.uint8)))
        n += 1
        if len(buf) == batch_size:
            yield np.stack(buf)
            buf = []
    if buf:
        yield np.stack(buf)


def proxy_feature_fn(dim=256, seed=0):
    """Seeded random strided-patch projection features. PLUMBING-VALIDATION
    ONLY — not comparable to InceptionV3 FID."""
    rng = np.random.default_rng(seed)
    w = None

    def fn(images):
        nonlocal w
        images = np.asarray(images, np.float32)
        b = images.shape[0]
        # 8x8 strided patches, global stats + random projection
        patches = images[:, ::8, ::8, :].reshape(b, -1)
        if w is None:
            w = rng.normal(size=(patches.shape[1], dim)).astype(np.float32)
            w /= np.sqrt(patches.shape[1])
        return np.tanh(patches @ w)

    return fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--a", type=str, help="samples: dir of .pkl/.npy/images")
    p.add_argument("--b", type=str, required=True, help="data dir (same formats)")
    p.add_argument("--rfid", action="store_true",
                   help="reconstruct --b through a stage-1 model; FID(recon, b)")
    p.add_argument("--yaml_path", type=str)
    p.add_argument("--model_path", type=str)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--limit", type=int, default=None, help="cap images per side")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--proxy_features", action="store_true")
    opt = p.parse_args()

    if opt.proxy_features:
        print("WARNING: --proxy_features computes proxy_fid (pipeline "
              "validation only; NOT comparable to InceptionV3 FID)",
              file=sys.stderr)
        feature_fn = proxy_feature_fn()
        metric = "proxy_fid"
    else:
        from dynamicvectorquantization_tpu.eval.fid import inception_feature_fn

        feature_fn = inception_feature_fn()
        metric = "fid"

    from dynamicvectorquantization_tpu.eval.fid import fid_between

    if opt.rfid:
        from dynamicvectorquantization_tpu.utils.platform import (
            honor_jax_platforms_env,
        )

        honor_jax_platforms_env()
        import jax

        from dynamicvectorquantization_tpu.config.yaml_config import load_config
        from dynamicvectorquantization_tpu.utils.instantiate import (
            instantiate_from_config,
        )

        config = load_config([opt.yaml_path], [])
        model = instantiate_from_config(config["model"])
        if opt.model_path:
            from dynamicvectorquantization_tpu.train.loop import _load_first_stage

            model.ckpt_path = opt.model_path
            variables = _load_first_stage(model)
        else:
            print("NOTE: random-init model (no --model_path) — rFID is only "
                  "a plumbing check", file=sys.stderr)
            variables = model.init(jax.random.PRNGKey(0))

        fwd = jax.jit(lambda v, x: model.net.apply(v, x)[0])
        orig, recon = [], []
        for b in iter_source(opt.b, opt.batch_size, opt.limit, opt.size):
            orig.append(b)
            recon.append(np.asarray(fwd(variables, b)))
        value = fid_between(orig, recon, feature_fn)
        metric = "proxy_rfid" if metric == "proxy_fid" else "rfid"
    else:
        assert opt.a, "--a required unless --rfid"
        a = iter_source(opt.a, opt.batch_size, opt.limit, opt.size)
        b = iter_source(opt.b, opt.batch_size, opt.limit, opt.size)
        value = fid_between(a, b, feature_fn)

    print(json.dumps({"metric": metric, "value": round(value, 4)}))


if __name__ == "__main__":
    main()

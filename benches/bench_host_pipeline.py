#!/usr/bin/env python3
"""Host input-pipeline benchmark: native C++ (libjpeg + fused normalize) vs
PIL, on synthetic JPEGs at ImageNet-like sizes.

The pipeline target (SURVEY.md §7.3.6) is to keep the host ahead of ~900
img/s/chip device encode throughput; this reports single-thread decode+
transform rates for both paths (the PrefetchLoader scales them by worker
count).
"""
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from PIL import Image

    from dynamicvectorquantization_tpu import native
    from dynamicvectorquantization_tpu.data import transforms as T

    rng = np.random.default_rng(0)
    # ImageNet-like sources: ~1000x800 JPEGs (median ImageNet image is
    # several hundred px per side; the DCT-domain downscale only engages
    # when min_side/2 >= target)
    jpegs = []
    for i in range(24):
        base = rng.uniform(0, 255, (50, 40, 3))
        arr = np.kron(base, np.ones((20, 20, 1))).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        jpegs.append(buf.getvalue())

    n_iters = 4

    def pil_path(data, grng):
        img = Image.open(io.BytesIO(data))
        return T.imagenet_train_transform(img, 256, grng)

    def native_path(data, grng):
        arr = native.decode_jpeg(data, min_side=256)
        if arr is None:
            return pil_path(data, grng)
        img = T.resize_shorter(Image.fromarray(arr), 256)
        w, h = img.size
        top = int(grng.integers(0, h - 256 + 1))
        left = int(grng.integers(0, w - 256 + 1))
        out = native.crop_flip_normalize(
            np.asarray(img), top, left, 256, bool(grng.uniform() < 0.5)
        )
        return out

    results = {}
    for name, fn in (("pil", pil_path), ("native", native_path)):
        grng = np.random.default_rng(1)
        fn(jpegs[0], grng)  # warm
        t0 = time.perf_counter()
        for _ in range(n_iters):
            for d in jpegs:
                out = fn(d, grng)
        dt = time.perf_counter() - t0
        results[name] = len(jpegs) * n_iters / dt
        assert out.shape == (256, 256, 3) and out.dtype == np.float32

    print(json.dumps({
        "metric": "host_pipeline_images_per_sec_per_thread",
        "value": round(results["native"], 1),
        "unit": "images/sec/thread",
        "vs_baseline": round(results["native"] / results["pil"], 3),
        "config": {"pil_ips": round(results["pil"], 1)},
    }))


if __name__ == "__main__":
    main()

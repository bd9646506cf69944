#!/usr/bin/env python3
"""2-D PCA scatter of the learned codebook (working replacement for the
reference's broken `scripts/tools/codebook_pca.py`)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def main():
    from dynamicvectorquantization_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()

    p = argparse.ArgumentParser()
    p.add_argument("--yaml_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--out", type=str, default="codebook_pca.png")
    opt = p.parse_args()

    import jax
    import numpy as np

    from dynamicvectorquantization_tpu.config.yaml_config import load_config
    from dynamicvectorquantization_tpu.utils.instantiate import instantiate_from_config

    config = load_config([opt.yaml_path])
    model = instantiate_from_config(config["model"])
    if opt.model_path and opt.model_path.endswith((".ckpt", ".pth")):
        from dynamicvectorquantization_tpu.utils.torch_ckpt import load_dqvae_checkpoint

        variables = load_dqvae_checkpoint(opt.model_path)
    else:
        variables = model.init(jax.random.PRNGKey(0))

    cb = np.asarray(variables["ema"]["quantize"]["codebook"][:-1])
    centered = cb - cb.mean(0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    xy = centered @ vt[:2].T

    # render without matplotlib: rasterize a scatter into a PIL image
    from PIL import Image

    size = 512
    img = np.full((size, size, 3), 255, np.uint8)
    mn, mx = xy.min(0), xy.max(0)
    pts = ((xy - mn) / np.maximum(mx - mn, 1e-9) * (size - 9) + 4).astype(int)
    for x, y in pts:
        img[size - 1 - y - 2 : size - 1 - y + 2, x - 2 : x + 2] = (30, 60, 200)
    Image.fromarray(img).save(opt.out)
    print("wrote", opt.out, "| explained var (2 comps):",
          float((np.linalg.norm(xy, axis=0) ** 2).sum()
                / (np.linalg.norm(centered) ** 2)))


if __name__ == "__main__":
    main()

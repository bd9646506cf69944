#!/usr/bin/env python3
"""Grain-map overlays on validation images (reference
`scripts/tools/visualize_dual_grain.py`)."""
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
    p.add_argument("--save_path", type=str, default="grain_vis")
    p.add_argument("--num_images", type=int, default=16)
    p.add_argument("--dataset", type=str, default="synthetic")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from dynamicvectorquantization_tpu.config.yaml_config import load_config
    from dynamicvectorquantization_tpu.utils.instantiate import instantiate_from_config
    from dynamicvectorquantization_tpu.utils.logging import make_grid, to_uint8
    from dynamicvectorquantization_tpu.utils.viz import draw_grain_map_color
    from dynamicvectorquantization_tpu.data import datasets
    from dynamicvectorquantization_tpu.data.pipeline import PrefetchLoader

    config = load_config([opt.yaml_path])
    model = instantiate_from_config(config["model"])
    if opt.model_path and opt.model_path.endswith((".ckpt", ".pth")):
        from dynamicvectorquantization_tpu.utils.torch_ckpt import load_dqvae_checkpoint

        variables = load_dqvae_checkpoint(opt.model_path)
    else:
        variables = model.init(jax.random.PRNGKey(0))

    if opt.dataset == "synthetic":
        ds = datasets.SyntheticDataset(size=model.image_size, length=opt.num_images)
    else:
        ds = datasets.ImageNetValidation({"size": model.image_size})
    loader = PrefetchLoader(ds, batch_size=opt.num_images, shuffle=False)
    batch = next(iter(loader.epoch(0)))
    x = jnp.asarray(batch["image"])

    _, _, _, grains, _, _ = model.encode(variables, x)
    overlay = draw_grain_map_color(np.asarray(x), np.asarray(grains))
    os.makedirs(opt.save_path, exist_ok=True)
    Image.fromarray(make_grid(to_uint8(overlay))).save(
        os.path.join(opt.save_path, "grain_overlay.png")
    )
    print("wrote", os.path.join(opt.save_path, "grain_overlay.png"))


if __name__ == "__main__":
    main()

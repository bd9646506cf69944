#!/usr/bin/env python3
"""Batch unconditional sampling -> pickled numpy batches (+optional PNG grids)
for FID evaluation.

Reference surface: `scripts/sample_val/sample_dynamic_uncond.py:22-118` —
flags batch_size / temperature / top_k(300) / top_k_pos(1024) / top_p /
top_p_pos / sample_num(5000) / --sample_with_fixed_pos; output = pickled
numpy image batches under <save_path>/numpys plus optional grids.

TPU-native: sampling is one jitted KV-cached program per batch.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--yaml_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint: orbax dir or reference torch .ckpt")
    p.add_argument("--save_path", type=str, default="samples")
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--sample_num", type=int, default=5000)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=300)
    p.add_argument("--top_k_pos", type=int, default=1024)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--top_p_pos", type=float, default=1.0)
    p.add_argument("--sample_with_fixed_pos", action="store_true")
    p.add_argument("--save_grids", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--kv_cache_dtype", type=str, default=None,
                   choices=("int8",),
                   help="int8: quantized decode KV caches (ops/kv_int8.py) — "
                        "halves the HBM stream that dominates sampling")
    return p


def load_model_and_variables(yaml_path, model_path, seed=0, kv_cache_dtype=None):
    from dynamicvectorquantization_tpu.utils.model_loading import (
        load_model_and_variables as _load,
    )

    return _load(yaml_path, model_path, seed, kv_cache_dtype)


def main():
    from dynamicvectorquantization_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()

    opt = get_parser().parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    model, variables = load_model_and_variables(
        opt.yaml_path, opt.model_path, opt.seed, opt.kv_cache_dtype
    )

    os.makedirs(os.path.join(opt.save_path, "numpys"), exist_ok=True)

    @jax.jit
    def sample_batch(variables, rng):
        c = model.encode_to_c(jnp.zeros((opt.batch_size, 1)))
        cc, fc, cp, fp = model.sample_from_scratch(
            variables, *c, rng=rng,
            temperature=opt.temperature,
            top_k=opt.top_k, top_p=opt.top_p,
            top_k_pos=opt.top_k_pos, top_p_pos=opt.top_p_pos,
            fix_fine_position=opt.sample_with_fixed_pos,
        )
        return model.decode_to_img(variables, cc, fc, cp, fp)

    rng = jax.random.PRNGKey(opt.seed)
    total = 0
    bi = 0
    while total < opt.sample_num:
        rng, sub = jax.random.split(rng)
        imgs = np.asarray(sample_batch(variables, sub))
        imgs_u8 = np.clip((imgs + 1) * 127.5, 0, 255).astype(np.uint8)
        with open(os.path.join(opt.save_path, "numpys", f"batch_{bi:05d}.pkl"), "wb") as f:
            pickle.dump(imgs_u8, f)
        if opt.save_grids:
            from PIL import Image

            from dynamicvectorquantization_tpu.utils.logging import make_grid

            Image.fromarray(make_grid(imgs_u8[:16])).save(
                os.path.join(opt.save_path, f"grid_{bi:05d}.png")
            )
        total += imgs.shape[0]
        bi += 1
        print(f"\r sampled {total}/{opt.sample_num}", end="")
    print()


if __name__ == "__main__":
    main()

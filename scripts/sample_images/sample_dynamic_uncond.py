#!/usr/bin/env python3
"""Unconditional sampling -> one PNG per image.

Reference surface: `scripts/sample_images/sample_dynamic_uncond.py:18-103`.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from scripts.sample_val.sample_dynamic_uncond import get_parser, load_model_and_variables


def main():
    from dynamicvectorquantization_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()

    opt = get_parser().parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    model, variables = load_model_and_variables(opt.yaml_path, opt.model_path, opt.seed)
    os.makedirs(opt.save_path, exist_ok=True)

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
    while total < opt.sample_num:
        rng, sub = jax.random.split(rng)
        imgs = np.asarray(sample_batch(variables, sub))
        for img in imgs:
            if total >= opt.sample_num:
                break
            u8 = np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)
            Image.fromarray(u8).save(os.path.join(opt.save_path, f"{total:06d}.png"))
            total += 1
        print(f"\r sampled {total}/{opt.sample_num}", end="")
    print()


if __name__ == "__main__":
    main()

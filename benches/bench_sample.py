#!/usr/bin/env python3
"""Secondary benchmark: DQ-Transformer KV-cached sampling throughput.

Full p6c18 geometry (6+18 layers, n_embd 1024, vocab 1027) with the
dual-grain 16/32 permuter; measures images/sec for full coarse-to-fine
generation (up to 257 + 1025 AR steps, two transformers each).

The reference's sampler recomputes the full prefix per token (O(T^2) per
token, no KV cache — `stackgpt.py` samplers), so this path is the framework's
largest algorithmic win; the KV-cached cost is O(T) attention per token.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dynamicvectorquantization_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()

    import jax
    import jax.numpy as jnp

    from dynamicvectorquantization_tpu.models.dqtransformer import Dualformer
    from dynamicvectorquantization_tpu.config.yaml_config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config([os.path.join(repo, "configs/stage2/uncond_imagenet_p6c18.yml")])
    params = cfg["model"]["params"]
    params["first_stage_config"]["params"]["ckpt_path"] = None
    # cap sequence capacity to the r=0.5 regime for a realistic decode length
    params["permuter_config"]["params"]["coarse_max_len"] = 161
    params["permuter_config"]["params"]["fine_max_len"] = 645

    from dynamicvectorquantization_tpu.utils.instantiate import instantiate_from_config

    kv = os.environ.get("DQVQ_BENCH_SAMPLE_KV")  # "int8" -> quantized caches
    if kv:
        params["transformer_config"]["params"]["kv_cache_dtype"] = kv

    model = instantiate_from_config(cfg["model"])
    batch = int(os.environ.get("DQVQ_BENCH_SAMPLE_BATCH", "8"))
    dtype = os.environ.get("DQVQ_BENCH_SAMPLE_DTYPE", "bfloat16")

    fs_vars = model.first_stage_model.init(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), fs_vars)
    if dtype == "bfloat16":
        # decode is HBM-bound (cache reads + weight streaming): bf16
        # params/caches halve the traffic
        variables["transformer"] = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables["transformer"],
        )

    @jax.jit
    def sample(variables, rng):
        c = model.encode_to_c(jnp.zeros((batch, 1)))
        cc, fc, cp, fp = model.sample_from_scratch(
            variables, *c, rng=rng, top_k=300, top_k_pos=1024,
            fix_fine_position=True,
        )
        return cc, fc, cp, fp

    t0 = time.perf_counter()
    out = sample(variables, jax.random.PRNGKey(2))
    float(out[0].sum())
    print(f"compile+first batch: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    iters = int(os.environ.get("DQVQ_BENCH_SAMPLE_ITERS", "3"))
    t0 = time.perf_counter()
    for i in range(iters):
        out = sample(variables, jax.random.PRNGKey(3 + i))
        float(out[0].sum())
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    # Reference sampler anchor (analytic — the reference publishes no
    # sampling throughput): `stackgpt.py:234-340` recomputes the FULL prefix
    # through both stacks for every generated token, no KV cache. At p6c18
    # (24 layers, d=1024, T~=800 tokens/image) that is
    #   sum_t 24 * 12*d^2 * 2 * t  ~=  0.6 GFLOP * 800^2/2  ~=  192 TFLOP/img
    # (+ ~20% attention O(t^2) terms). An A100's 312 bf16-TFLOP/s peak bounds
    # it at <= 1.6 img/s even at impossible 100% MXU utilization; at a
    # realistic 40% it is ~0.65 img/s. vs_reference_est uses the GENEROUS
    # 100%-utilization bound, so the multiple is a floor.
    A100_SAMPLE_IPS_CEILING = 1.6
    print(json.dumps({
        "metric": "dqtransformer_sample_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "vs_reference_est": round(ips / A100_SAMPLE_IPS_CEILING, 2),
        "config": {"batch": batch, "dtype": dtype, "kv_cache": kv or dtype},
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Micro-bench the encode path's components to find the non-MXU time.

Components (flagship geometry, 256^2, ch=128, z=256, codebook 1024):
  entropy   — 32-bin KDE patch entropy (VPU)
  encoder   — dual-grain conv/attn tower (MXU)
  vq        — quant_conv + fused Pallas VQ
  full      — everything (= bench.py path)

Usage: python3 benches/bench_encode_parts.py [batch] [iters]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, carry0, iters):
    carry = carry0
    out = fn(carry)
    float(out[-1])
    out = fn(out[-1])
    float(out[-1])
    t0 = time.perf_counter()
    carry = out[-1]
    for _ in range(iters):
        out = fn(carry)
        carry = out[-1]
    float(carry)
    return time.perf_counter() - t0


def main():
    from dynamicvectorquantization_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _dual_config
    from dynamicvectorquantization_tpu.models.dqvae import DualGrainVQModel
    from dynamicvectorquantization_tpu.ops.entropy import patch_entropy

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    cfg = _dual_config(256, ch=128, z_ch=256, codebook=1024)
    cfg["compute_dtype"] = "bfloat16"
    model = DualGrainVQModel(**cfg)
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 256, 256, 3),
                           minval=-1, maxval=1)

    results = {}

    @jax.jit
    def full(carry):
        quant, _, info, grains, gate, ent = model.net.apply(
            variables, x + carry * 1e-8, method="encode"
        )
        return info[2], jnp.float32(jnp.sum(info[2]) % 997) / 997.0

    results["full"] = timed(full, jnp.float32(0.0), iters)

    @jax.jit
    def entropy_only(carry):
        e = patch_entropy(x + carry * 1e-8, 16)
        return e, jnp.sum(e) % 997 / 997.0

    results["entropy"] = timed(entropy_only, jnp.float32(0.0), iters)

    ent_static = patch_entropy(x, 16)

    @jax.jit
    def encoder_only(carry):
        h = model.net.apply(
            variables, x + carry * 1e-8, ent_static,
            method=lambda net, xx, ee: net.encoder(xx, ee),
        )
        s = jnp.float32(jnp.sum(h["h_dual"].astype(jnp.float32)) % 997) / 997.0
        return h["h_dual"], s

    results["encoder"] = timed(encoder_only, jnp.float32(0.0), iters)

    h_dict = model.net.apply(variables, x, ent_static,
                             method=lambda net, xx, ee: net.encoder(xx, ee))
    h_static = h_dict["h_dual"]
    mask_static = h_dict["codebook_mask"]

    @jax.jit
    def vq_only(carry):
        def run(net, hh, mm):
            hh = net.quant_conv(hh)
            return net.quantize(hh, codebook_mask=mm, temp=0.0, train=False)

        quant, loss, info = model.net.apply(
            variables, h_static + carry * 1e-8, mask_static, method=run
        )
        return info[2], jnp.float32(jnp.sum(info[2]) % 997) / 997.0

    results["vq"] = timed(vq_only, jnp.float32(0.0), iters)

    n = batch * iters
    report = {
        k: {"ms_per_batch": round(1000 * v / iters, 2),
            "img_per_s": round(n / v, 1)}
        for k, v in results.items()
    }
    overhead = results["full"] - results["encoder"] - results["entropy"] - results["vq"]
    report["unaccounted_ms_per_batch"] = round(1000 * overhead / iters, 2)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

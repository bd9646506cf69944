#!/usr/bin/env python3
"""Trace the headline encode path (bench.py geometry) and print the top
device ops — the tool behind the r04 encoder-throughput work.

Env: DQVQ_BENCH_BATCH (default 32), DQVQ_BENCH_DTYPE (default bfloat16),
DQVQ_PROFILE_DIR (default /tmp/encode_profile), DQVQ_PROFILE_HLO=1 to
decompose fusion buckets by their root op.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dynamicvectorquantization_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _dual_config
    from dynamicvectorquantization_tpu.models.dqvae import DualGrainVQModel
    from benches._xplane import analyze, fusion_roots_from_hlo

    batch = int(os.environ.get("DQVQ_BENCH_BATCH", "32"))
    dtype = os.environ.get("DQVQ_BENCH_DTYPE", "bfloat16")
    logdir = os.environ.get("DQVQ_PROFILE_DIR", "/tmp/encode_profile")

    cfg = _dual_config(256, ch=128, z_ch=256, codebook=1024)
    if dtype and dtype != "float32":
        cfg["compute_dtype"] = dtype
    model = DualGrainVQModel(**cfg)
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (batch, 256, 256, 3), minval=-1, maxval=1
    )

    @jax.jit
    def encode(variables, x, carry):
        quant, emb_loss, info, grains, gate, ent = model.net.apply(
            variables, x + carry * 1e-8, train=False, method="encode"
        )
        new_carry = jnp.float32(jnp.sum(info[2]) % 997) / 997.0
        return info[2], grains, new_carry

    fusion_roots = None
    if os.environ.get("DQVQ_PROFILE_HLO", "0") == "1":
        compiled = encode.lower(variables, x, jnp.float32(0.0)).compile()
        fusion_roots = fusion_roots_from_hlo(compiled.as_text())
        run = lambda c: compiled(variables, x, c)
    else:
        run = lambda c: encode(variables, x, c)

    carry = jnp.float32(0.0)
    for _ in range(3):  # compile + warmup
        _, _, carry = run(carry)
    float(carry)
    print("warm; tracing...", file=sys.stderr)

    with jax.profiler.trace(logdir):
        for _ in range(5):
            _, _, carry = run(carry)
        float(carry)

    analyze(logdir, fusion_roots=fusion_roots)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Micro-bench: fused causal attention kernel fwd+bwd at production geometry.

Times value_and_grad of a scalar loss over `fused_causal_attention` at the
StackGPT shape (B=8, T=805, D=1024, H=16) — the unit that runs 24x per
train-step direction. Compares against the XLA naive path when
DQVQ_BENCH_ATTN_NAIVE=1.

Env: DQVQ_ATTN_QB (query block, read by the kernel at import),
DQVQ_BENCH_ATTN_B/T/D/H, DQVQ_BENCH_ATTN_RATE (dropout, default 0.1).
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

    b = int(os.environ.get("DQVQ_BENCH_ATTN_B", "8"))
    t = int(os.environ.get("DQVQ_BENCH_ATTN_T", "805"))
    d = int(os.environ.get("DQVQ_BENCH_ATTN_D", "1024"))
    h = int(os.environ.get("DQVQ_BENCH_ATTN_H", "16"))
    rate = float(os.environ.get("DQVQ_BENCH_ATTN_RATE", "0.1"))
    iters = int(os.environ.get("DQVQ_BENCH_ATTN_ITERS", "20"))
    naive = os.environ.get("DQVQ_BENCH_ATTN_NAIVE", "0") == "1"

    from dynamicvectorquantization_tpu.ops.attention_pallas import (
        _pick_qb,
        fused_causal_attention,
    )

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, t, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, t, d), jnp.bfloat16)

    def naive_attn(q, k, v):
        hd = d // h
        qh = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3).astype(jnp.float32)
        kh = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3).astype(jnp.float32)
        vh = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3).astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / (hd ** 0.5)
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        return y.transpose(0, 2, 1, 3).reshape(b, t, d).astype(q.dtype)

    @jax.jit
    def step(q, k, v, seed):
        def loss(q, k, v):
            if naive:
                y = naive_attn(q, k, v)
            else:
                y = fused_causal_attention(q, k, v, seed, h, rate)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
        # chain iterations via a data dependency
        return l, q + 1e-12 * grads[0].astype(q.dtype)

    t0 = time.perf_counter()
    l, q2 = step(q, k, v, 7)
    float(l)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    l, q2 = step(q2, k, v, 8)
    float(l)

    t0 = time.perf_counter()
    for i in range(iters):
        l, q2 = step(q2, k, v, i)
    float(l)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "attn_fwd_bwd_ms", "value": round(dt * 1e3, 3),
        "unit": "ms/call", "config": {"B": b, "T": t, "D": d, "H": h,
                                      "rate": rate, "qb": _pick_qb(t),
                                      "naive": naive},
    }))


if __name__ == "__main__":
    main()

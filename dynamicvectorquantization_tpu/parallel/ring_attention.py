"""Ring attention: causal self-attention with the sequence sharded over an
"sp" mesh axis (sequence/context parallelism).

The reference has no sequence-parallel story (DDP only, SURVEY.md §2.10).
This is the TPU-native "sp" axis for long-context training: each device
holds a contiguous T/n slice of the sequence's q/k/v; key/value blocks
rotate around the ring via `ppermute` (one ICI hop per tick) while every
device folds the visiting block into a running online softmax. No device
ever materializes the full (T, T) score matrix or the full K/V — memory is
O(T/n) activations + one visiting block, and the per-tick ppermute overlaps
with the next tick's compute.

Differentiable end-to-end (ppermute's transpose is the reverse permutation),
so the same function serves training; equivalence of outputs AND gradients
with dense causal attention is tested in tests/test_ring_attention.py.

Layout contract: call inside `shard_map` over a mesh with axis `sp`;
q/k/v are the LOCAL sequence shards (B, H, T_local, hd) in ring order
(device i holds positions [i*T_local, (i+1)*T_local)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ring_attention(q, k, v, axis_name: str = "sp", sm_scale=None):
    """Causal attention over a sequence sharded on `axis_name`.

    q, k, v: (B, H, T_local, hd) local shards. Returns the local (B, H,
    T_local, hd) attention output. f32 online-softmax accumulation
    regardless of input dtype (matches nn/transformer.py decode path).
    """
    b, h, tl, hd = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / float(hd) ** 0.5
    # static axis size (jax.lax.psum(1, ...) is traced; the ring is unrolled
    # over the STATIC tick count so reverse-mode AD is unrestricted)
    try:
        n = jax.lax.axis_size(axis_name)
    except AttributeError:  # older jax
        n = jax.core.get_axis_env().axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    neg = jnp.finfo(jnp.float32).min

    q_pos = idx * tl + jnp.arange(tl)  # global positions of local queries
    qf = q.astype(jnp.float32)

    # ring schedule: at tick r every device holds the k/v block that
    # ORIGINATED on device (idx - r) mod n; blocks hop +1 each tick
    perm = [(i, (i + 1) % n) for i in range(n)]

    m = jnp.full((b, h, tl), neg, jnp.float32)
    l = jnp.zeros((b, h, tl), jnp.float32)
    acc = jnp.zeros((b, h, tl, hd), jnp.float32)
    k_cur, v_cur = k, v
    for r in range(n):
        src = (idx - r) % n
        k_pos = src * tl + jnp.arange(tl)
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32)
        ) * sm_scale
        causal = k_pos[None, None, None, :] <= q_pos[None, None, :, None]
        s = jnp.where(causal, s, neg)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32)
        )
        m = m_new
        if r + 1 < n:  # last tick needs no hop
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
    # every local query attends at least to itself -> l > 0
    return (acc / l[..., None]).astype(q.dtype)

"""Ring attention ("sp" axis) == dense causal attention: outputs and grads.

Runs on the conftest's virtual 8-device CPU mesh via shard_map. The
reference has no sequence parallelism (SURVEY.md §2.10); see
parallel/ring_attention.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from dynamicvectorquantization_tpu.parallel.ring_attention import ring_attention


def _dense_causal(q, k, v):
    hd = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / float(hd) ** 0.5
    t = q.shape[2]
    causal = jnp.tril(jnp.ones((t, t), bool))
    s = jnp.where(causal[None, None], s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_matches_dense_and_grads(np_rng, sp):
    if len(jax.devices()) < sp:
        pytest.skip("needs virtual multi-device mesh")
    b, h, t, hd = 2, 3, 8 * 4, 16
    q = jnp.asarray(np_rng.normal(size=(b, h, t, hd)).astype(np.float32))
    k = jnp.asarray(np_rng.normal(size=(b, h, t, hd)).astype(np.float32))
    v = jnp.asarray(np_rng.normal(size=(b, h, t, hd)).astype(np.float32))

    mesh = Mesh(np.asarray(jax.devices()[:sp]), ("sp",))
    spec = P(None, None, "sp", None)
    ring = shard_map(
        ring_attention, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec,
    )

    out = jax.jit(ring)(q, k, v)
    ref = _dense_causal(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # gradients through the ppermute ring == dense gradients
    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_causal(q, k, v) ** 2)

    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)

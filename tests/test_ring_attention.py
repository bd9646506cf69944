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


# ---------------------------------------------------------------------------
# sp on the PRODUCT model (VERDICT r02 #5): the full StackGPT training
# forward — segment embeddings, abs pos_emb, the position->content shifted
# handoff — under shard_map with ring attention must reproduce the dense
# forward AND its gradients.
# ---------------------------------------------------------------------------
_SGPT_KW = dict(
    vocab_size=20, coarse_position_size=12, fine_position_size=20,
    segment_size=2, block_size=64, position_layer=2, content_layer=2,
    n_head=2, n_embd=32, embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
    content_pad_code=17, coarse_position_pad_code=9, fine_position_pad_code=17,
)


def _sgpt_streams(b=2, lc=5, lf=8):
    import numpy as onp

    g = onp.random.default_rng(3)
    return dict(
        coarse_content=jnp.asarray(g.integers(0, 16, (b, lc)), jnp.int32),
        fine_content=jnp.asarray(g.integers(0, 16, (b, lf)), jnp.int32),
        coarse_position=jnp.asarray(g.integers(0, 9, (b, lc)), jnp.int32),
        fine_position=jnp.asarray(g.integers(0, 16, (b, lf)), jnp.int32),
        coarse_seg=jnp.zeros((b, lc), jnp.int32),
        fine_seg=jnp.ones((b, lf), jnp.int32),
    )


@pytest.mark.slow  # compile-dominated on the 1-CPU host (suite-trim r03)
def test_stackgpt_sp_matches_dense():
    from jax.sharding import Mesh

    from dynamicvectorquantization_tpu.nn.stackgpt import StackGPT
    from dynamicvectorquantization_tpu.parallel.stackgpt_sp import (
        stackgpt_forward_sp,
    )

    dense = StackGPT(**_SGPT_KW)
    sp = StackGPT(**_SGPT_KW, sequence_parallel_axis="sp")
    streams = _sgpt_streams()  # t = lc + lf - 1 = 12, divides sp=4
    variables = dense.init(jax.random.PRNGKey(0), **streams)
    # pos_emb inits to zeros — randomize so absolute positions matter
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    variables["params"]["pos_emb"] = (
        jax.random.normal(jax.random.PRNGKey(9),
                          variables["params"]["pos_emb"].shape) * 0.02
    )

    import numpy as onp

    mesh = Mesh(onp.asarray(jax.devices()[:4]), ("sp",))

    ref = dense.apply(variables, **streams)
    out = jax.jit(
        lambda v: stackgpt_forward_sp(sp, v, mesh, streams)
    )(variables)
    for k in ("position_logits", "content_logits"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)

    def dense_loss(params):
        o = dense.apply({"params": params}, **streams)
        return (jnp.mean(o["content_logits"] ** 2)
                + jnp.mean(o["position_logits"] ** 2))

    def sp_loss(params):
        o = stackgpt_forward_sp(sp, {"params": params}, mesh, streams)
        return (jnp.mean(o["content_logits"] ** 2)
                + jnp.mean(o["position_logits"] ** 2))

    g_ref = jax.grad(dense_loss)(variables["params"])
    g_sp = jax.jit(jax.grad(sp_loss))(variables["params"])
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_sp = jax.tree_util.tree_leaves(g_sp)
    assert len(flat_ref) == len(flat_sp)
    for (path, a), b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )

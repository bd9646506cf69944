"""EMA codebook math vs an independent numpy re-derivation of the reference
semantics (`modules/vector_quantization/quantize2_mask.py:66-132`): buffer
decay, Laplace-smoothed weight refresh, and the restart bookkeeping."""
import jax
import jax.numpy as jnp
import numpy as np

from dynamicvectorquantization_tpu.ops.vq import VectorQuantizeEMA


def _numpy_reference_step(weight, cluster_ema, embed_ema, vectors, decay=0.99,
                          eps=1e-5):
    """One EMA step WITHOUT restart, per the reference spec."""
    k = weight.shape[0] - 1
    d = ((vectors[:, None] - weight[None, :k]) ** 2).sum(-1)
    idx = d.argmin(1)
    cluster = np.bincount(idx, minlength=k).astype(np.float32)
    esum = np.zeros((k, vectors.shape[1]), np.float32)
    np.add.at(esum, idx, vectors)
    cluster_ema = cluster_ema * decay + cluster * (1 - decay)
    embed_ema = embed_ema * decay + esum * (1 - decay)
    n = cluster_ema.sum()
    normalized = n * (cluster_ema + eps) / (n + k * eps)
    new_weight = weight.copy()
    new_weight[:k] = embed_ema / normalized[:, None]
    return new_weight, cluster_ema, embed_ema, idx


def test_ema_step_matches_reference_math(rng):
    k, d = 16, 8
    vq = VectorQuantizeEMA(
        codebook_size=k, codebook_dim=d, restart_unused_codes=False,
        use_pallas=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, d))
    variables = vq.init({"params": rng}, x)

    w0 = np.asarray(variables["ema"]["codebook"]).copy()
    c0 = np.asarray(variables["ema"]["cluster_size_ema"]).copy()
    e0 = np.asarray(variables["ema"]["embed_ema"]).copy()

    state = variables
    vecs = np.asarray(x).reshape(-1, d)
    for step in range(3):
        (_, _, (_, _, code)), mut = vq.apply(state, x, train=True, mutable=["ema"])
        state = {**state, "ema": mut["ema"]}
        w0, c0, e0, idx_ref = _numpy_reference_step(w0, c0, e0, vecs)
        np.testing.assert_array_equal(np.asarray(code).reshape(-1), idx_ref)
        np.testing.assert_allclose(
            np.asarray(state["ema"]["cluster_size_ema"]), c0, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(state["ema"]["embed_ema"]), e0, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(state["ema"]["codebook"]), w0, rtol=1e-5, atol=1e-6
        )


def test_restart_bookkeeping(rng):
    """Restart: dead codes (cluster_ema < 1) get a random input vector,
    cluster set to 1; used codes untouched (quantize2_mask.py:102-105)."""
    k, d = 8, 4
    vq = VectorQuantizeEMA(
        codebook_size=k, codebook_dim=d, restart_unused_codes=True,
        use_pallas=False, decay=0.5,
    )
    x = jnp.broadcast_to(jnp.array([5.0, 5.0, 5.0, 5.0]), (1, 4, 4, d)) + (
        jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, d)) * 0.01
    )
    variables = vq.init({"params": rng}, x)
    state = variables
    for i in range(3):
        (_, _, _), mut = vq.apply(
            state, x, train=True, mutable=["ema"],
            rngs={"vq": jax.random.PRNGKey(10 + i)},
        )
        state = {**state, "ema": mut["ema"]}
    cs = np.asarray(state["ema"]["cluster_size_ema"])
    emb = np.asarray(state["ema"]["embed_ema"])
    # every dead code was restarted: cluster floor is 1
    assert (cs >= 1.0 - 1e-5).all()
    # restarted rows carry (noised) input vectors ~ 5.0
    dead = cs <= 1.0 + 1e-5
    assert dead.any()
    assert np.allclose(emb[dead].mean(), 5.0, atol=0.2)

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


# --------------------------------------------------------------------------
# MaskVectorQuantize (gradient-trained masked quantizer,
# reference quantize_codebook_mask.py:15-185)
# --------------------------------------------------------------------------
def test_mask_vector_quantize_semantics():
    """Codebook trains by GRADIENTS (no EMA collection), kmeans init seeds
    from the init batch, the orthogonal regularizer is present, and the
    registry resolves the reference target to this class (VERDICT r02 #6:
    the old alias to the EMA quantizer was semantically wrong)."""
    from dynamicvectorquantization_tpu.ops.quantizers import MaskVectorQuantize
    from dynamicvectorquantization_tpu.utils.instantiate import get_obj_from_str

    assert (
        get_obj_from_str(
            "modules.vector_quantization.quantize_codebook_mask.MaskVectorQuantize"
        )
        is MaskVectorQuantize
    )

    q = MaskVectorQuantize(codebook_size=16, codebook_dim=8, kmeans_init=True,
                           orthogonal_reg_weight=2.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8)) + 3.0
    mask = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 4, 1)) > 0.5, 1.0, 0.25
    )
    variables = q.init({"params": jax.random.PRNGKey(2)}, x, mask)

    # no EMA state; kmeans-initialized rows live near the data (norm ~ |x|,
    # not the uniform +-1/16 init)
    assert "ema" not in variables
    emb0 = np.asarray(variables["params"]["embedding"])
    assert np.linalg.norm(emb0, axis=1).mean() > 1.0

    def loss_fn(params):
        _, loss, _ = q.apply({"params": params}, x, mask, train=True)
        return loss

    g = jax.grad(loss_fn)(variables["params"])
    assert float(jnp.linalg.norm(g["embedding"])) > 0.0  # grads reach codebook

    # orthogonal term: loss increases with the reg weight on identical input
    q0 = MaskVectorQuantize(codebook_size=16, codebook_dim=8, kmeans_init=True,
                            orthogonal_reg_weight=0.0)
    _, l0, _ = q0.apply(variables, x, mask)
    _, l2, _ = q.apply(variables, x, mask)
    en = emb0 / np.linalg.norm(emb0, axis=1, keepdims=True)
    diff = en @ en.T - np.eye(16)
    expected = 2.0 * (diff**2).sum() / 16**2
    assert np.isclose(float(l2) - float(l0), expected, rtol=1e-4)

    # masked commitment: ratio-scaled (reference :116-118)
    xq, lm, (_, _, code) = q.apply(variables, x, mask)
    assert code.shape == (2, 4, 4)
    assert xq.shape == x.shape


def test_mask_vector_quantize_cosine_and_gumbel():
    from dynamicvectorquantization_tpu.ops.quantizers import MaskVectorQuantize

    q = MaskVectorQuantize(codebook_size=8, codebook_dim=4, use_cosine_sim=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 2, 4))
    variables = q.init({"params": jax.random.PRNGKey(1)}, x)
    _, _, (_, _, c_det) = q.apply(variables, x)
    _, _, (_, _, c_det2) = q.apply(variables, x)
    assert (np.asarray(c_det) == np.asarray(c_det2)).all()  # temp=0: argmax
    # temp>0 + train: stochastic assignment via the "vq" rng stream
    _, _, (_, _, c_a) = q.apply(variables, x, temp=5.0, train=True,
                                rngs={"vq": jax.random.PRNGKey(2)})
    _, _, (_, _, c_b) = q.apply(variables, x, temp=5.0, train=True,
                                rngs={"vq": jax.random.PRNGKey(9)})
    assert (np.asarray(c_a) != np.asarray(c_b)).any()

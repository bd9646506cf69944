"""Fused AdamW Pallas kernel vs the optax.adamw chain it replaces — exact
state-structure and numerical equivalence over multiple steps (interpret
mode on CPU; the compiled kernel runs on TPU in the stage-2 train step)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamicvectorquantization_tpu.ops.fused_adamw import fused_adamw_apply


def _params():
    k = jax.random.PRNGKey(0)
    return {
        "dense": {"kernel": jax.random.normal(k, (64, 128)) * 0.1,
                  "bias": jnp.zeros((128,))},
        "emb": {"embedding": jax.random.normal(jax.random.fold_in(k, 1),
                                               (33, 128)) * 0.1},
        "ln": {"scale": jnp.ones((128,)), "bias": jnp.zeros((128,))},
    }


def _mask(params):
    # decay only 2D kernels (mirrors stage2._decay_mask's spirit)
    return jax.tree_util.tree_map(lambda p: p.ndim == 2, params)


def test_fused_adamw_matches_optax():
    params = _params()
    schedule = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, 10)
    tx = optax.adamw(schedule, b1=0.9, b2=0.95, weight_decay=0.01,
                     mask=_mask)
    opt_ref = tx.init(params)
    opt_fused = tx.init(params)
    p_ref, p_fused = params, params

    for step in range(4):
        g = jax.tree_util.tree_map(
            lambda p: jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(7), step), p.shape
            ) * 0.01 + 0.001 * p,
            p_ref,
        )
        updates, opt_ref = tx.update(g, opt_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_fused, opt_fused = fused_adamw_apply(
            g, opt_fused, p_fused, schedule, b1=0.9, b2=0.95,
            weight_decay=0.01, mask=_mask, interpret=True,
        )

    assert jax.tree_util.tree_structure(opt_ref) == jax.tree_util.tree_structure(
        opt_fused
    )
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(opt_ref),
                    jax.tree_util.tree_leaves(opt_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)


def test_fused_adamw_under_jit_and_grid():
    """3D leaf + a leaf bigger than one grid block + jit wrapping."""
    params = {"w": jax.random.normal(jax.random.PRNGKey(0), (4, 96, 128)),
              "big": jax.random.normal(jax.random.PRNGKey(1), (4096, 256))}
    tx = optax.adamw(1e-2, b1=0.9, b2=0.999, weight_decay=0.0)
    opt = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def fused(g, opt, p):
        return fused_adamw_apply(g, opt, p, 1e-2, b1=0.9, b2=0.999,
                                 weight_decay=0.0, interpret=True)

    p2, opt2 = fused(g, opt, params)
    updates, opt_ref = tx.update(g, opt, params)
    p_ref = optax.apply_updates(params, updates)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)


def test_fused_adamw_param_copy_and_bf16_grads():
    """param_copy_dtype returns an in-kernel bf16 cast of the new params,
    and bf16 grads produce the SAME update as their f32 upcast (the
    mixed-precision trainer differentiates w.r.t. the bf16 working copy)."""
    params = _params()
    tx = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.01, mask=_mask)
    opt = tx.init(params)
    g_bf16 = jax.tree_util.tree_map(
        lambda p: (jax.random.normal(jax.random.PRNGKey(3), p.shape)
                   * 0.01).astype(jnp.bfloat16),
        params,
    )
    g_f32 = jax.tree_util.tree_map(lambda t: t.astype(jnp.float32), g_bf16)

    p_a, copy_a, opt_a = fused_adamw_apply(
        g_bf16, opt, params, 1e-3, b1=0.9, b2=0.95, weight_decay=0.01,
        mask=_mask, interpret=True, param_copy_dtype="bfloat16",
    )
    p_b, opt_b = fused_adamw_apply(
        g_f32, opt, params, 1e-3, b1=0.9, b2=0.95, weight_decay=0.01,
        mask=_mask, interpret=True,
    )
    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_a),
                    jax.tree_util.tree_leaves(opt_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the copy is exactly astype(bf16) of the new params
    for c, p in zip(jax.tree_util.tree_leaves(copy_a),
                    jax.tree_util.tree_leaves(p_a)):
        assert c.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(c), np.asarray(p.astype(jnp.bfloat16)))

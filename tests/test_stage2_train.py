"""Stage-2 trainer: AdamW split, pad-row gradient freeze, loss decreases."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.train.stage2 import Stage2Trainer, _decay_mask
from tests.test_dqtransformer import dualformer  # noqa: F401 (fixture)


def test_decay_mask_structure(dualformer):  # noqa: F811
    model, variables = dualformer
    mask = _decay_mask(variables["transformer"]["params"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    kernels = [m for p, m in flat if "kernel" in str(p)]
    others = [m for p, m in flat if "kernel" not in str(p)]
    assert all(kernels) and kernels, "Dense kernels must decay"
    assert not any(others), "embeddings/LN/bias/pos_emb must not decay"


def test_train_step_and_pad_freeze(dualformer):  # noqa: F811
    model, variables = dualformer
    # warmup_steps=0: step 0 of a warmup has lr == 0 (reference LambdaLR
    # semantics), which would make "params moved" assertions vacuous
    trainer = Stage2Trainer(model, learning_rate=1e-3, warmup_steps=0, max_steps=50)
    state = trainer.init_state(variables)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3), minval=-1, maxval=1)

    step = jax.jit(trainer.train_step)
    pad = model.transformer.content_pad_code
    row0 = np.asarray(state.params["content_emb"]["embedding"][pad])

    s, logs = step(state, variables, x, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["train_loss"]))
    # pad row unchanged (gradient frozen); others moved
    row1 = np.asarray(s.params["content_emb"]["embedding"][pad])
    np.testing.assert_array_equal(row0, row1)
    emb0 = np.asarray(state.params["content_emb"]["embedding"])
    emb1 = np.asarray(s.params["content_emb"]["embedding"])
    assert not np.allclose(emb0, emb1)

    losses = [float(logs["train_loss"])]
    for i in range(5):
        s, logs = step(s, variables, x, x, jax.random.PRNGKey(2 + i))
        losses.append(float(logs["train_loss"]))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    val = jax.jit(trainer.eval_step)(s, variables, x, x)
    assert np.isfinite(float(val["val_loss"]))


@pytest.mark.slow  # compile-dominated on the 1-CPU host (suite-trim r03)
def test_train_steps_scan_matches_sequential(dualformer):  # noqa: F811
    import jax.numpy as jnp

    model, variables = dualformer
    trainer = Stage2Trainer(model, learning_rate=1e-3, warmup_steps=0,
                            max_steps=50)
    xs = jax.random.uniform(jax.random.PRNGKey(9), (2, 2, 64, 64, 3),
                            minval=-1, maxval=1)
    rng = jax.random.PRNGKey(10)

    s_seq = trainer.init_state(variables)
    for i, ri in enumerate(jax.random.split(rng, 2)):
        s_seq, logs_seq = jax.jit(trainer.train_step)(
            s_seq, variables, xs[i], xs[i], ri)

    s_scan, logs_scan = jax.jit(trainer.train_steps)(
        trainer.init_state(variables), variables, xs, None, rng)
    assert logs_scan["train_loss"].shape == (2,)
    np.testing.assert_allclose(
        float(logs_scan["train_loss"][1]), float(logs_seq["train_loss"]),
        rtol=1e-5)
    a = jax.tree_util.tree_leaves(s_seq.params)
    b = jax.tree_util.tree_leaves(s_scan.params)
    for x_, y_ in zip(a, b):
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_),
                                   atol=1e-6, rtol=1e-5)
    assert int(s_scan.step) == 2


@pytest.mark.slow  # compile-dominated on the 1-CPU host (suite-trim r03)
def test_mixed_precision_bf16_step(dualformer):  # noqa: F811
    import jax.numpy as jnp

    model, variables = dualformer
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3),
                           minval=-1, maxval=1)
    t32 = Stage2Trainer(model, learning_rate=1e-3, warmup_steps=0, max_steps=50)
    t16 = Stage2Trainer(model, learning_rate=1e-3, warmup_steps=0, max_steps=50,
                        compute_dtype="bfloat16")
    state = t32.init_state(variables)
    rng = jax.random.PRNGKey(6)
    s32, logs32 = jax.jit(t32.train_step)(state, variables, x, x, rng)
    s16, logs16 = jax.jit(t16.train_step)(state, variables, x, x, rng)
    # master params remain f32 and move
    leaves = jax.tree_util.tree_leaves(s16.params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    import numpy as np

    w32 = np.asarray(jax.tree_util.tree_leaves(s32.params)[0])
    w16 = np.asarray(leaves[0])
    assert not np.allclose(w16, np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
    # bf16 loss within bf16 resolution of the f32 loss at init
    assert abs(float(logs16["train_loss"]) - float(logs32["train_loss"])) \
        < 0.05 * max(1.0, abs(float(logs32["train_loss"])))


def test_encode_dataset_pipelined_order_and_values(dualformer):  # noqa: F811
    """encode_dataset (r04: dispatch-all-then-gather pipelining) returns the
    same streams, in dataset order, as per-image encode_to_z."""
    model, variables = dualformer
    trainer = Stage2Trainer(model, learning_rate=1e-3, warmup_steps=0, max_steps=50)
    images = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(7), (5, 64, 64, 3), minval=-1, maxval=1))
    cached = trainer.encode_dataset(variables, images, batch=2)  # ragged tail
    for i in range(len(images)):
        _, z = model.encode_to_z(variables, jnp.asarray(images[i:i + 1]))
        for k in z:
            np.testing.assert_array_equal(
                np.asarray(z[k])[0], cached[k][i],
                err_msg=f"stream {k} image {i}",
            )

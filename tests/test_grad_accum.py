"""Gradient accumulation (reference `accumulate_grad_batches`,
train.py:248-257): accum=N averages microbatch grads and steps each optimizer
once. Stage-2 is verified exactly against hand-computed averaged grads;
stage-1 (which threads EMA/batch_stats through the microbatches) is verified
with identical microbatches against the accum=1 step.

Also covers the top-k+last checkpoint retention policy.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dynamicvectorquantization_tpu.train.stage1 import Stage1Trainer
from dynamicvectorquantization_tpu.train.stage2 import Stage2Trainer, _decay_mask
from tests.test_dqtransformer import dualformer  # noqa: F401 (fixture)
from tests.test_stage1_train import trainer_and_state  # noqa: F401 (fixture)

pytestmark = pytest.mark.slow  # full train-step compiles; quick tier: -m 'not slow'


def test_stage2_accum_equals_mean_grad(dualformer):  # noqa: F811
    """accum=2 step == one update with the exact mean of per-microbatch grads
    (dropout off, so rngs don't enter)."""
    model, variables = dualformer
    t2 = Stage2Trainer(model, learning_rate=1e-3, warmup_steps=0, max_steps=50,
                       accum=2)
    state = t2.init_state(variables)

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x1 = jax.random.uniform(k1, (2, 64, 64, 3), minval=-1, maxval=1)
    x2 = jax.random.uniform(k2, (2, 64, 64, 3), minval=-1, maxval=1)
    xs = jnp.stack([x1, x2])

    new_state, logs = jax.jit(t2.train_step)(
        state, variables, xs, xs, jax.random.PRNGKey(7)
    )

    # expected: average the two microbatch grads, freeze pad rows, adamw
    def loss_fn(params, xi):
        v = {
            "transformer": {**variables["transformer"], "params": params},
            "first_stage": variables["first_stage"],
        }
        out = model.forward(v, xi, xi, train=True,
                            rngs={"dropout": jax.random.PRNGKey(0)})
        return model.loss(out)

    g1 = jax.grad(loss_fn)(state.params, x1)
    g2 = jax.grad(loss_fn)(state.params, x2)
    grads = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    grads = t2._freeze_pad_rows(grads)
    updates, _ = t2.tx.update(grads, state.opt, state.params)
    expected = optax.apply_updates(state.params, updates)

    flat_got = jax.tree_util.tree_leaves(new_state.params)
    flat_want = jax.tree_util.tree_leaves(expected)
    # adamw normalizes by sqrt(v): ~1e-7 compile-order grad noise becomes
    # ~1e-6 param noise where grads are tiny — atol reflects that, and is
    # still 100x below the 1e-3 lr update scale
    for a, b in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)

    # logged loss is the microbatch mean
    l1 = float(loss_fn(state.params, x1))
    l2 = float(loss_fn(state.params, x2))
    np.testing.assert_allclose(float(logs["train_loss"]), (l1 + l2) / 2,
                               rtol=1e-5)


def test_stage1_accum_runs_and_matches_identical_microbatches(
    trainer_and_state,  # noqa: F811
):
    """With two IDENTICAL microbatches (and restart randomness disabled via
    matched rngs being irrelevant to the loss), the averaged grads equal the
    single-batch grads up to the EMA drift of the second microbatch — the AE
    params must match the accum=1 step closely, and all state pieces update."""
    trainer, state, x = trainer_and_state
    t_acc = Stage1Trainer(trainer.model, learning_rate=1e-3, warmup_steps=0,
                          max_steps=100, accum=2)

    xs = jnp.stack([x, x])
    s1, logs1 = jax.jit(trainer.train_step)(state, x, jax.random.PRNGKey(9))
    s2, logs2 = jax.jit(t_acc.train_step)(state, xs, jax.random.PRNGKey(9))

    for k in ("train_aeloss", "train_rec_loss", "train_disc_loss"):
        assert np.isfinite(float(logs2[k])), k
    # identical microbatches: the logged (averaged) losses must track the
    # single-batch step's — this is what catches a missing 1/N on the grads
    # and logs (adam normalizes scale, so params alone wouldn't). Microbatch 2
    # runs after the first EMA update + codebook restart, so its quant/commit
    # terms legitimately shift — tolerance reflects that, not float noise.
    for k in ("train_aeloss", "train_rec_loss", "train_nll_loss"):
        np.testing.assert_allclose(float(logs2[k]), float(logs1[k]), rtol=0.2,
                                   err_msg=k)
    # params: averaged grads ~= single grads up to second-microbatch EMA
    # drift + restart rng; each element moves at most one adam step (first
    # step is ±lr), so diffs are bounded by 2*lr with the bulk identical
    a = np.concatenate([np.ravel(v) for v in
                        jax.tree_util.tree_leaves(s1.ae_params)])
    b = np.concatenate([np.ravel(v) for v in
                        jax.tree_util.tree_leaves(s2.ae_params)])
    assert np.all(np.abs(a - b) <= 2.1e-3), float(np.max(np.abs(a - b)))
    assert np.mean(np.abs(a - b)) < 5e-4
    # EMA updated twice vs once -> decay applied twice
    c1 = np.asarray(s1.ema["quantize"]["cluster_size_ema"])
    c2 = np.asarray(s2.ema["quantize"]["cluster_size_ema"])
    assert not np.allclose(c1, c2), "accum must apply per-microbatch EMA"
    # discriminator stepped once
    assert int(s2.step) == int(state.step) + 1


def test_ckpt_manager_keeps_latest_plus_best(tmp_path):
    from dynamicvectorquantization_tpu.train.loop import Trainer

    import orbax.checkpoint as ocp

    t = Trainer(logdir=str(tmp_path), save_top_k=2)
    mngr = t._ckpt_manager("val_loss")
    tree = {"w": np.zeros(3, np.float32)}
    # best at steps 1 and 2; later steps worse — latest must survive anyway
    for step, loss in [(1, 0.1), (2, 0.2), (3, 0.9), (4, 0.8)]:
        mngr.save(step, args=ocp.args.StandardSave(tree),
                  metrics={"val_loss": loss})
    mngr.wait_until_finished()
    kept = set(mngr.all_steps())
    assert 4 in kept, f"latest step pruned: {kept}"
    assert 1 in kept and 2 in kept, f"best-k steps pruned: {kept}"
    assert mngr.latest_step() == 4

"""Trainer-level sp / pp equivalence (VERDICT r02 "missing" #2: the sp and
pp axes reachable from the product trainer, not just library demos).

`Stage2Trainer.train_step` with `model.transformer_train_apply` installed
(exactly what `train.py --sp/--pp` does via `Trainer._fit_stage2`) must
produce the same losses and updated params as the dense single-program
step. Runs on the conftest's virtual 8-device CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.parallel.mesh import make_mesh_2d
from dynamicvectorquantization_tpu.train.stage2 import Stage2State, Stage2Trainer
from tests.test_dqtransformer import dualformer  # noqa: F401 (fixture)

pytestmark = pytest.mark.slow  # full train-step compiles; quick tier: -m 'not slow'


def _streams(b=4, lc=5, lf=10, seed=11):
    """Synthetic cached-codes permuter streams with T = lc + lf + 1 = 16
    (the image-fed fixture pads to T=83, which no sp degree divides)."""
    g = np.random.default_rng(seed)
    pad_tail = lambda a, pad: np.concatenate(
        [a[:, :-1], np.full((b, 1), pad, a.dtype)], axis=1
    )
    return {
        "coarse_content": jnp.asarray(
            pad_tail(g.integers(0, 64, (b, lc)), 64), jnp.int32),
        "coarse_position": jnp.asarray(
            pad_tail(g.integers(0, 16, (b, lc)), 16), jnp.int32),
        "coarse_segment": jnp.zeros((b, lc), jnp.int32),
        "fine_content": jnp.asarray(
            pad_tail(g.integers(0, 64, (b, lf)), 64), jnp.int32),
        "fine_position": jnp.asarray(
            pad_tail(g.integers(0, 64, (b, lf)), 64), jnp.int32),
        "fine_segment": jnp.ones((b, lf), jnp.int32),
    }


def _dense_step(model, variables, z):
    trainer = Stage2Trainer(model, learning_rate=1e-3, warmup_steps=0,
                            max_steps=50, fused_adamw=False)
    state0 = trainer.init_state(variables)
    rng = jax.random.PRNGKey(3)
    s_ref, logs_ref = jax.jit(trainer.train_step)(state0, variables, z, z, rng)
    return trainer, state0, rng, s_ref, logs_ref


@pytest.fixture(scope="module")
def dense_ref(dualformer):  # noqa: F811
    """The dense reference step compiled ONCE for both the sp and pp
    equivalence tests (suite-trim r04: each test used to recompile it)."""
    model, variables = dualformer
    z = _streams()
    return (z,) + _dense_step(model, variables, z)


def _assert_step_matches(s_ref, logs_ref, s_par, logs_par):
    for k in logs_ref:
        np.testing.assert_allclose(float(logs_par[k]), float(logs_ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_par.params)):
        # collective reduction order differs; Adam normalizes near-zero
        # grads into ~1e-4 param noise (same bound as the tp test)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-4)


def test_sp_trainer_step_matches_dense(dualformer, dense_ref):  # noqa: F811
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device mesh")
    model, variables = dualformer
    # T = 16: divides sp=2
    z, trainer, state0, rng, s_ref, logs_ref = dense_ref

    from dynamicvectorquantization_tpu.parallel.stackgpt_sp import (
        stackgpt_train_losses_sp,
    )

    mesh = make_mesh_2d(2, 2, axis2="sp")
    model.transformer_train_apply = (
        lambda v, kw, r: stackgpt_train_losses_sp(model, v, mesh, kw, rngs=r)
    )
    try:
        from jax.sharding import NamedSharding, PartitionSpec as P

        zs = jax.device_put(z, NamedSharding(mesh, P("dp")))
        with mesh:
            s_sp, logs_sp = jax.jit(trainer.train_step)(
                state0, variables, zs, zs, rng
            )
        _assert_step_matches(s_ref, logs_ref, s_sp, logs_sp)

        # eval path rides the same hook (train.py --sp evaluates sharded too)
        with mesh:
            logs_ev = jax.jit(trainer.eval_step)(
                s_sp, variables, zs, zs
            )
        assert np.isfinite(float(logs_ev["val_loss"]))
    finally:
        model.transformer_train_apply = None


def test_sp_indivisible_sequence_raises(dualformer):  # noqa: F811
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device mesh")
    model, variables = dualformer
    z = _streams(lc=5, lf=9)  # T = 15: does not divide 2
    trainer = Stage2Trainer(model, learning_rate=1e-3, warmup_steps=0,
                            max_steps=50, fused_adamw=False)
    state0 = trainer.init_state(variables)

    from dynamicvectorquantization_tpu.parallel.stackgpt_sp import (
        stackgpt_train_losses_sp,
    )

    mesh = make_mesh_2d(2, 2, axis2="sp")
    model.transformer_train_apply = (
        lambda v, kw, r: stackgpt_train_losses_sp(model, v, mesh, kw, rngs=r)
    )
    try:
        with pytest.raises(ValueError, match="must divide the sp axis"):
            with mesh:
                jax.jit(trainer.train_step)(
                    state0, variables, z, z, jax.random.PRNGKey(3)
                )
    finally:
        model.transformer_train_apply = None


def test_pp_trainer_step_matches_dense(dualformer, dense_ref):  # noqa: F811
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device mesh")
    model, variables = dualformer
    z, trainer, state0, rng, s_ref, logs_ref = dense_ref

    from dynamicvectorquantization_tpu.parallel.stackgpt_pp import (
        stackgpt_train_losses_pp,
    )

    mesh = make_mesh_2d(2, 2, axis2="pp")  # content_layer=2 -> 1 layer/stage
    model.transformer_train_apply = (
        lambda v, kw, r: stackgpt_train_losses_pp(
            model, v, mesh, kw, microbatches=2, rngs=r
        )
    )
    try:
        from jax.sharding import NamedSharding, PartitionSpec as P

        zs = jax.device_put(z, NamedSharding(mesh, P("dp")))
        with mesh:
            s_pp, logs_pp = jax.jit(trainer.train_step)(
                state0, variables, zs, zs, rng
            )
        _assert_step_matches(s_ref, logs_ref, s_pp, logs_pp)
    finally:
        model.transformer_train_apply = None


def test_pp_cli_train_loop(tmp_path):
    """--pp 2 end-to-end through the product CLI: Trainer builds the
    (dp, pp) mesh itself, installs the pp training forward, and runs a
    2-step epoch (image-fed path, batch 4 -> 2 microbatches)."""
    import sys

    import train as train_cli

    argv = [
        "train.py", "--base", "configs/smoke/dqtransformer-uncond-tiny.yml",
        "--max_epochs", "1", "--max_steps_per_epoch", "2",
        "--logdir", str(tmp_path), "--name", "pp2", "--pp", "2",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        train_cli.main()
    finally:
        sys.argv = old
    runs = list(tmp_path.iterdir())
    assert runs and any((r / "metrics.jsonl").exists() for r in runs)

"""FSDP / ZeRO-3 analog (--activate_fsdp): params sharded over dp must be
semantics-preserving, and the Trainer must emit sharded specs for both the
param and optimizer fields."""
import jax
import numpy as np
import pytest

from dynamicvectorquantization_tpu.parallel.mesh import (
    fsdp_param_shardings,
    make_mesh,
)
from dynamicvectorquantization_tpu.train.stage2 import Stage2State, Stage2Trainer
from tests.test_dqtransformer import dualformer  # noqa: F401 (fixture)

pytestmark = pytest.mark.slow  # full train-step compiles; quick tier: -m 'not slow'


def test_fsdp_step_matches_unsharded(dualformer):  # noqa: F811
    model, variables = dualformer
    x = jax.random.uniform(jax.random.PRNGKey(9), (8, 64, 64, 3),
                           minval=-1, maxval=1)
    trainer = Stage2Trainer(model, learning_rate=1e-3, warmup_steps=0,
                            max_steps=50)
    state0 = trainer.init_state(variables)
    rng = jax.random.PRNGKey(4)
    s_ref, logs_ref = jax.jit(trainer.train_step)(state0, variables, x, x, rng)

    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    p_sh = fsdp_param_shardings(mesh, state0.params, min_elements=512)
    params = jax.device_put(state0.params, p_sh)
    state = Stage2State(
        params=params,
        opt=trainer.tx.init(params),  # moments born sharded like the params
        step=jax.device_put(state0.step, NamedSharding(mesh, P())),
        epoch=jax.device_put(state0.epoch, NamedSharding(mesh, P())),
    )
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    s_f, logs_f = jax.jit(trainer.train_step)(state, vs, xs, xs, rng)

    # some large leaves actually live sharded
    n_sharded = sum(
        1 for l in jax.tree_util.tree_leaves(s_f.params)
        if l.sharding.spec != P()
    )
    assert n_sharded > 0, "fsdp sharded nothing"
    for k in logs_ref:
        np.testing.assert_allclose(float(logs_f[k]), float(logs_ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_trainer_emits_fsdp_specs(tmp_path, dualformer):  # noqa: F811
    from jax.sharding import PartitionSpec as P

    from dynamicvectorquantization_tpu.train.loop import Trainer

    model, variables = dualformer
    trainer = Stage2Trainer(model, learning_rate=1e-3, warmup_steps=0,
                            max_steps=50)
    state = trainer.init_state(variables)

    t = Trainer(logdir=str(tmp_path), fsdp=True)
    t.shard_min_elements = 512  # tiny test model
    sh = t._state_shardings(state, ("opt",), param_fields=("params",))
    p_specs = [s.spec for s in jax.tree_util.tree_leaves(sh.params)]
    o_specs = [s.spec for s in jax.tree_util.tree_leaves(sh.opt)]
    assert any(s != P() for s in p_specs), "params all replicated under fsdp"
    assert any(s != P() for s in o_specs), "moments all replicated under fsdp"

    t1 = Trainer(logdir=str(tmp_path), opt_sharding=True)
    t1.shard_min_elements = 512
    sh1 = t1._state_shardings(state, ("opt",), param_fields=("params",))
    assert all(s.spec == P() for s in jax.tree_util.tree_leaves(sh1.params)), \
        "ZeRO-1 must keep params replicated"

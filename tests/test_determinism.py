"""Determinism / consistency checks (SURVEY.md §5 "race detection" analog):
jit-vs-eager parity, PRNG-threaded reproducibility, remat gradient equality."""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dynamicvectorquantization_tpu.models.dqvae import DualGrainVQModel
from dynamicvectorquantization_tpu.train.stage1 import Stage1Trainer
from tests.test_dqvae import dual_config
from tests.test_stage1_train import trainer_and_state  # noqa: F401 (fixture)

pytestmark = pytest.mark.slow  # full train-step compiles; quick tier: -m 'not slow'


def test_jit_vs_eager_parity():
    model = DualGrainVQModel(**dual_config(resolution=64, entropy_router=True))
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), minval=-1, maxval=1)

    eager = model.net.apply(variables, x)
    jitted = jax.jit(lambda v, xx: model.net.apply(v, xx))(variables, x)
    np.testing.assert_allclose(
        np.asarray(eager[0]), np.asarray(jitted[0]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(eager[2]), np.asarray(jitted[2]))


def test_train_step_deterministic(trainer_and_state):  # noqa: F811
    trainer, state, x = trainer_and_state
    step = jax.jit(trainer.train_step)
    s1, logs1 = step(state, x, jax.random.PRNGKey(7))
    s2, logs2 = step(state, x, jax.random.PRNGKey(7))
    for k in logs1:
        np.testing.assert_allclose(float(logs1[k]), float(logs2[k]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.ae_params["decoder"]["conv_out"]["kernel"]),
        np.asarray(s2.ae_params["decoder"]["conv_out"]["kernel"]),
        rtol=1e-6,
    )


def test_remat_matches_no_remat(trainer_and_state):  # noqa: F811
    trainer, state, x = trainer_and_state
    remat_trainer = Stage1Trainer(
        trainer.model, learning_rate=1e-3, warmup_steps=0, max_steps=100, remat=True
    )
    s1, logs1 = jax.jit(trainer.train_step)(state, x, jax.random.PRNGKey(9))
    s2, logs2 = jax.jit(remat_trainer.train_step)(state, x, jax.random.PRNGKey(9))
    np.testing.assert_allclose(
        float(logs1["train_aeloss"]), float(logs2["train_aeloss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.ae_params["decoder"]["conv_out"]["kernel"]),
        np.asarray(s2.ae_params["decoder"]["conv_out"]["kernel"]),
        rtol=1e-4, atol=1e-6,
    )

"""Stage-1 GAN training step: losses finite, params update, EMA moves,
adaptive disc weight computed."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.models.dqvae import DualGrainVQModel
from dynamicvectorquantization_tpu.train.stage1 import Stage1Trainer
from tests.test_dqvae import dual_config


@pytest.fixture(scope="module")
def trainer_and_state():
    # 32^2 exercises the identical GAN-step code paths (LPIPS, disc, budget,
    # adaptive weight, EMA) at 1/4 the conv work (suite-trim r03)
    cfg = dual_config(resolution=32, entropy_router=True)
    cfg["lossconfig"] = {
        "target": "modules.losses.vqperceptual_multidisc.VQLPIPSWithDiscriminator",
        "params": {
            "disc_start": 0,
            "disc_config": {
                "target": "modules.discriminator.model.NLayerDiscriminator",
                "params": {"input_nc": 3, "ndf": 8, "n_layers": 2, "use_actnorm": False},
            },
            "disc_init": True,
            "codebook_weight": 1.0,
            "disc_weight": 1.0,
            "disc_weight_max": 0.75,
            "perceptual_weight": 1.0,
            "disc_loss": "hinge",
            "budget_loss_config": {
                "target": "modules.dynamic_modules.budget.BudgetConstraint_RatioMSE_DualGrain",
                "params": {"target_ratio": 0.5, "gamma": 1.0,
                           "min_grain_size": 2, "max_grain_size": 4},
            },
        },
    }
    model = DualGrainVQModel(**cfg)
    # warmup_steps=0: step 0 of a warmup has lr == 0 (reference LambdaLR
    # semantics), which would make "params moved" assertions vacuous
    trainer = Stage1Trainer(model, learning_rate=1e-3, warmup_steps=0, max_steps=100)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3), minval=-1, maxval=1)
    state = trainer.init_state(jax.random.PRNGKey(1), x)
    return trainer, state, x


def test_train_step_updates_everything(trainer_and_state):
    trainer, state, x = trainer_and_state
    step = jax.jit(trainer.train_step)
    new_state, logs = step(state, x, jax.random.PRNGKey(2))

    for k, v in logs.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(logs["train_d_weight"]) <= 0.75 + 1e-6

    # encoder/decoder params changed
    w0 = state.ae_params["decoder"]["conv_out"]["kernel"]
    w1 = new_state.ae_params["decoder"]["conv_out"]["kernel"]
    assert not np.allclose(np.asarray(w0), np.asarray(w1))
    # disc changed
    d0 = state.loss_params["discriminator"]["conv_0"]["kernel"]
    d1 = new_state.loss_params["discriminator"]["conv_0"]["kernel"]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    # LPIPS frozen (no optimizer on it)
    l0 = state.loss_params["perceptual_loss"]["net"]["conv_0"]["kernel"]
    l1 = new_state.loss_params["perceptual_loss"]["net"]["conv_0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    # VQ EMA state moved
    c0 = state.ema["quantize"]["cluster_size_ema"]
    c1 = new_state.ema["quantize"]["cluster_size_ema"]
    assert not np.allclose(np.asarray(c0), np.asarray(c1))
    assert int(new_state.step) == 1

    # second step runs on the new state (shapes stable under jit)
    s2, logs2 = step(new_state, x, jax.random.PRNGKey(3))
    assert np.isfinite(float(logs2["train_aeloss"]))
    # reconstruction should improve over a few steps on a fixed batch
    def rec(st):
        return float(trainer.eval_step(st, x)["val_rec_loss"])
    r0 = rec(state)
    st = s2
    for i in range(6):
        st, _ = step(st, x, jax.random.PRNGKey(4 + i))
    assert rec(st) < r0


def test_eval_step(trainer_and_state):
    trainer, state, x = trainer_and_state
    logs = jax.jit(trainer.eval_step)(state, x)
    for k, v in logs.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow  # compile-dominated on the 1-CPU host (suite-trim r03)
def test_train_steps_scan_matches_sequential(trainer_and_state):
    trainer, state, x = trainer_and_state
    xs = jnp.stack([x, x * 0.9])
    rng = jax.random.PRNGKey(7)

    s_seq = state
    for i, ri in enumerate(jax.random.split(rng, 2)):
        s_seq, logs_seq = jax.jit(trainer.train_step)(s_seq, xs[i], ri)

    s_scan, logs_scan = jax.jit(trainer.train_steps)(state, xs, rng)
    assert logs_scan["train_aeloss"].shape == (2,)
    np.testing.assert_allclose(
        float(logs_scan["train_aeloss"][1]), float(logs_seq["train_aeloss"]),
        rtol=1e-5, atol=1e-6)
    assert int(s_scan.step) == 2

    # scan and standalone compile to differently-fused f32 programs; Adam
    # normalizes near-zero gradient elements to +-lr, so single elements can
    # legitimately differ by a whole update. The trajectory statement that
    # IS stable: the scan-vs-sequential divergence is tiny relative to the
    # distance the params traveled from init (plus the per-step losses
    # above matching at rtol 1e-5).
    def dist(t1, t2):
        return sum(
            float(jnp.sum((a - b) ** 2))
            for a, b in zip(jax.tree_util.tree_leaves(t1),
                            jax.tree_util.tree_leaves(t2))
        ) ** 0.5

    for attr in ("ae_params", "ema", "loss_params"):
        traveled = dist(getattr(s_seq, attr), getattr(state, attr))
        diverged = dist(getattr(s_seq, attr), getattr(s_scan, attr))
        assert diverged < 0.05 * traveled, (attr, diverged, traveled)

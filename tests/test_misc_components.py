"""StyleGAN discriminator, text encoders, T2I variant, viz, loggers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamicvectorquantization_tpu.nn.stylegan_discriminator import (
    LucidrainsDiscriminator,
    StyleGAN2Discriminator,
)
from dynamicvectorquantization_tpu.nn.text_encoders import HashTextEncoder
from dynamicvectorquantization_tpu.utils.logging import ImageLogger, MetricLogger, make_grid, to_uint8
from dynamicvectorquantization_tpu.utils.viz import draw_grain_map_color


def test_stylegan2_discriminator(rng):
    d = StyleGAN2Discriminator(image_size=64, network_capacity=4,
                               attn_layers=(2,), fmap_max=64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3), minval=-1, maxval=1)
    variables = d.init(rng, x)
    out = d.apply(variables, x)
    assert out.shape == (4,)
    assert np.isfinite(np.asarray(out)).all()


def test_lucidrains_discriminator(rng):
    d = LucidrainsDiscriminator(dim=16, discr_layers=2, groups=4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), minval=-1, maxval=1)
    variables = d.init(rng, x)
    out = d.apply(variables, x)
    # 64 -> 32 -> 16 -> 4x4 VALID conv -> 13x13 patch logits
    assert out.shape == (2, 13, 13, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_hash_text_encoder():
    enc = HashTextEncoder(embed_dim=16, max_length=8)
    feats, mask = enc.encode_text(["a red cat", "blue dog running far away and more"])
    assert feats.shape == (2, 8, 16)
    np.testing.assert_array_equal(np.asarray(mask[0]), [1, 1, 1, 0, 0, 0, 0, 0])
    # deterministic
    feats2, _ = enc.encode_text(["a red cat", "blue dog running far away and more"])
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats2))


def test_t2i_dualformer_forward():
    from tests.test_dqtransformer import (
        PERMUTER_CFG, TRANSFORMER_CFG, UNCOND_CFG, CODEBOOK,
    )
    from tests.test_dqvae import dual_config
    from dynamicvectorquantization_tpu.models.dqtransformer import T2IDualformer

    fs_cfg = dual_config(resolution=64, entropy_router=True)
    fs_cfg["vqconfig"]["params"]["codebook_size"] = CODEBOOK
    model = T2IDualformer(
        transformer_config=TRANSFORMER_CFG,
        first_stage_config={
            "target": "models.stage1_dynamic.dqvae_dual_entropy.DualGrainVQModel",
            "params": fs_cfg,
        },
        uncond_stage_config=UNCOND_CFG,
        permuter_config=PERMUTER_CFG,
    )
    fs_vars = model.first_stage_model.init(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), fs_vars)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3), minval=-1, maxval=1)
    out = model.forward(variables, x, ["a cat", "a dog"])
    assert np.isfinite(float(out["content_loss"]))


def test_viz_and_loggers(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    grains = rng.integers(0, 2, (3, 4, 4))
    overlay = draw_grain_map_color(imgs, grains)
    assert overlay.shape == imgs.shape
    assert overlay.min() >= -1 and overlay.max() <= 1

    grid = make_grid(to_uint8(imgs), ncol=2)
    assert grid.dtype == np.uint8

    ml = MetricLogger(str(tmp_path))
    ml.log(1, {"train_rec_loss": 0.5}, "train")
    ml.log(2, {"train_rec_loss": 0.4}, "train")
    assert (tmp_path / "metrics.jsonl").exists()
    assert (tmp_path / "metrics.csv").exists()

    il = ImageLogger(str(tmp_path), batch_frequency=10)
    assert il.should_log(0) and not il.should_log(5)
    il.log({"inputs": imgs}, "train", 1, 0, 0)
    assert len(list((tmp_path / "images" / "train").glob("*.png"))) == 1


def test_reference_scheduler_ports():
    """`modules/scheduler/lr_scheduler.py:10-38` (LambdaWarmUpCosineScheduler)
    and `scheduler.py:49-101` (GradualWarmup chain) — dead code in the
    reference (no config reaches them) but ported for inventory completeness
    (VERDICT r02 #10)."""
    import numpy as np

    from dynamicvectorquantization_tpu.train.schedules import (
        gradual_warmup,
        lambda_warmup_cosine,
        make_schedule,
    )

    s = lambda_warmup_cosine(10, 0.1, 1.0, 0.0, 100)

    def ref(n):  # the reference schedule() verbatim in numpy
        if n < 10:
            return (1.0 - 0.0) / 10 * n + 0.0
        t = min((n - 10) / (100 - 10), 1.0)
        return 0.1 + 0.5 * (1.0 - 0.1) * (1 + np.cos(t * np.pi))

    for n in [0, 5, 10, 50, 100, 150]:
        assert abs(float(s(n)) - ref(n)) < 1e-6

    g = gradual_warmup(1e-3, 10, 5, 2.0, 100, 1e-5)
    assert abs(float(g(10)) - 2e-3) < 1e-8  # warmup peak = multiplier*base
    assert abs(float(g(15)) - 2e-3) < 1e-8  # held through buffer_steps
    assert 9.9e-6 < float(g(115)) < 2e-3  # annealing
    assert abs(float(g(1000)) - 1e-5) < 1e-8  # floor = min_lr

    for t in ["lambda-warmup-cosine", "gradual-warmup"]:
        assert make_schedule(t, 1e-4, 10, 100, 0.0) is not None

"""End-to-end DQ-VAE model tests on tiny shapes (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.models.dqvae import DualGrainVQModel, TripleGrainVQModel


def dual_config(resolution=64, entropy_router=True):
    if entropy_router:
        router = {
            "target": "modules.dynamic_modules.RouterDual.DualGrainFixedEntropyRouter",
            "params": {"threshold": 3.05},
        }
    else:
        router = {
            "target": "modules.dynamic_modules.RouterDual.DualGrainFeatureRouter",
            "params": {"num_channels": 32, "normalization_type": "group-8"},
        }
    return dict(
        encoderconfig={
            "target": "modules.dynamic_modules.EncoderDual.DualGrainEncoder",
            "params": {
                "ch": 16,
                "ch_mult": [1, 1, 2, 2, 4],
                "num_res_blocks": 1,
                "attn_resolutions": [4, 8],
                "dropout": 0.0,
                "in_channels": 3,
                "resolution": resolution,
                "z_channels": 32,
                "update_router": not entropy_router,
                "router_config": router,
            },
        },
        decoderconfig={
            "target": "modules.dynamic_modules.DecoderPositional.Decoder",
            "params": {
                "ch": 16,
                "in_ch": 32,
                "out_ch": 3,
                "ch_mult": [1, 1, 2, 2],
                "num_res_blocks": 1,
                "resolution": resolution,
                "attn_resolutions": [8],
                "latent_size": resolution // 8,
                "window_size": 2,
                "position_type": "fourier+learned",
            },
        },
        lossconfig=None,
        vqconfig={
            "target": "modules.vector_quantization.quantize2_mask.VectorQuantize2",
            "params": {
                "codebook_size": 64,
                "codebook_dim": 32,
                "commitment_beta": 0.25,
                "decay": 0.99,
                "restart_unused_codes": True,
                "use_pallas": False,
            },
        },
        quant_before_dim=32,
        quant_after_dim=32,
        image_size=resolution,
        entropy_patch_size=16,
    )


class TestDualGrainVQModel:
    @pytest.fixture(scope="class")
    def setup_entropy(self):
        model = DualGrainVQModel(**dual_config(entropy_router=True))
        variables = model.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), minval=-1, maxval=1)
        return model, variables, x

    def test_encode_decode_shapes(self, setup_entropy):
        model, variables, x = setup_entropy
        quant, emb_loss, info, grains, gate, x_entropy = model.encode(variables, x)
        assert quant.shape == (2, 8, 8, 32)  # fine grid = 64/8
        assert grains.shape == (2, 4, 4)  # coarse grid = 64/16
        assert info[2].shape == (2, 8, 8)
        assert x_entropy.shape == (2, 4, 4)
        assert gate.shape == (2, 4, 4, 2)
        dec = model.decode(variables, quant, grains)
        assert dec.shape == x.shape

    def test_forward_and_grain_merge_consistency(self, setup_entropy):
        model, variables, x = setup_entropy
        dec, diff, grains, gate, x_entropy = model.forward(variables, x)
        assert dec.shape == x.shape
        assert float(diff) >= 0
        # entropy-router gate == hard one-hot from threshold
        g = np.asarray(gate)
        assert set(np.unique(g)).issubset({0, 1})
        np.testing.assert_array_equal(g.argmax(-1), np.asarray(grains))

    def test_codebook_roundtrip(self, setup_entropy):
        model, variables, x = setup_entropy
        quant, _, info, grains, _, _ = model.encode(variables, x)
        code = info[2]
        emb = model.get_code_emb_with_depth(variables, code)
        assert emb.shape == (2, 8, 8, 32)
        # straight-through output == embedding lookup (fwd values)
        np.testing.assert_allclose(np.asarray(quant), np.asarray(emb), atol=1e-5)

    def test_feature_router_variant_with_gumbel_training(self):
        # 32^2 exercises the identical code paths at 1/4 the conv work
        # (suite-trim r03): coarse 2x2 / fine 4x4, router pools still valid
        model = DualGrainVQModel(**dual_config(resolution=32, entropy_router=False))
        variables = model.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1, maxval=1)
        (dec, diff, grains, gate, x_entropy), mut = model.forward(
            variables,
            x,
            train=True,
            rngs={"gumbel": jax.random.PRNGKey(2), "vq": jax.random.PRNGKey(3)},
            mutable=["ema"],
        )
        assert dec.shape == x.shape
        assert x_entropy is None  # feature-router model skips entropy
        assert "ema" in mut
        # gradient flows into the router gate params via gumbel ST + gate_grad
        def loss_fn(params):
            variables2 = {**variables, "params": params}
            (d, diff2, *_), _ = model.forward(
                variables2,
                x,
                train=True,
                rngs={"gumbel": jax.random.PRNGKey(2), "vq": jax.random.PRNGKey(3)},
                mutable=["ema"],
            )
            return jnp.mean(d**2) + diff2

        grads = jax.grad(loss_fn)(variables["params"])
        gate_grads = grads["encoder"]["router"]["gate"]["kernel"]
        assert float(jnp.abs(gate_grads).max()) > 0


def test_triple_grain_model():
    resolution = 64
    cfg = dual_config(resolution)
    cfg["encoderconfig"] = {
        "target": "modules.dynamic_modules.EncoderTriple.TripleGrainEncoder",
        "params": {
            "ch": 16,
            "ch_mult": [1, 1, 2, 2, 4, 4],
            "num_res_blocks": 1,
            "attn_resolutions": [2, 4],
            "dropout": 0.0,
            "in_channels": 3,
            "resolution": resolution,
            "z_channels": 32,
            "router_config": {
                "target": "modules.dynamic_modules.RouterTriple.TripleGrainFeatureRouter",
                "params": {"num_channels": 32},
            },
        },
    }
    model = TripleGrainVQModel(**cfg)
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), minval=-1, maxval=1)
    quant, emb_loss, info, grains, gate, x_entropy = model.encode(variables, x)
    assert quant.shape == (2, 8, 8, 32)  # fine = 64/8
    assert grains.shape == (2, 2, 2)  # coarse = 64/32
    assert gate.shape == (2, 2, 2, 3)
    dec = model.decode(variables, quant, grains)
    assert dec.shape == x.shape

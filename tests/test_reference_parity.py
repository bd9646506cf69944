"""End-to-end activation parity against the ACTUAL reference torch code.

BASELINE.json's acceptance criterion is "reconstructions/samples matching
PyTorch checkpoints within float tolerance". This file makes that claim
falsifiable: it imports the reference repo at /root/reference *directly*
(stubbing only `pytorch_lightning` and `torchvision`, which are not in the
image and are unused on the tested paths), builds the real torch
DualGrainVQModel (`models/stage1_dynamic/dqvae_dual_entropy.py:65`) and
StackGPT (`modules/dynamic_modules/stackgpt.py:98`), random-initializes,
exports the state_dict through `utils.torch_ckpt.convert_*`, and asserts our
flax models reproduce the reference activations:

  * patch entropy map
  * grain gate / indices (exact)
  * VQ code indices (exact), quantized feature map, commitment loss
  * decoded image
  * StackGPT position/content logits and masked losses

Skipped when /root/reference is not present (e.g. a user checkout).
"""
from __future__ import annotations

import pathlib
import sys
import types

import numpy as np
import pytest

REF_ROOT = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF_ROOT.exists(), reason="reference repo not available"
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# Reference import harness
# ---------------------------------------------------------------------------

def _install_stubs():
    """Stub pytorch_lightning / torchvision (absent from the image).

    Only module-level imports touch them on the paths under test:
    `pl.LightningModule` as a base class, and `torchvision.transforms` /
    `torchvision.models` attribute imports that are never called.
    """
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        sys.modules["pytorch_lightning"] = pl

    if "torchvision" not in sys.modules:
        class _Anything:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise RuntimeError("torchvision stub invoked")

        def _getattr(_name):
            return _Anything

        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.__getattr__ = _getattr  # PEP 562 module getattr
        tv.models = types.ModuleType("torchvision.models")
        tv.models.__getattr__ = _getattr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.models"] = tv.models


@pytest.fixture(scope="session")
def ref():
    """Importable reference repo namespace.

    Session scope (suite-trim r05): the sampling-parity modules import this
    fixture; module scope re-ran the stub install + reference import once
    per importing module."""
    _install_stubs()
    if str(REF_ROOT) not in sys.path:
        sys.path.insert(0, str(REF_ROOT))
    import importlib

    mods = types.SimpleNamespace()
    mods.dqvae_dual = importlib.import_module(
        "models.stage1_dynamic.dqvae_dual_entropy"
    )
    mods.stackgpt = importlib.import_module("modules.dynamic_modules.stackgpt")
    return mods


THRESH_JSON = str(
    REF_ROOT
    / "scripts/tools/thresholds/entropy_thresholds_imagenet_train_patch-16.json"
)


def _model_kwargs(entropy_router: bool, resolution: int = 64):
    """One config dict consumed verbatim by BOTH the reference torch model and
    ours (the registry resolves the same target strings)."""
    if entropy_router:
        router = {
            "target": "modules.dynamic_modules.RouterDual.DualGrainFixedEntropyRouter",
            "params": {"json_path": THRESH_JSON, "fine_grain_ratito": 0.5},
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
                "ch": 32,
                "ch_mult": [1, 1, 2, 2, 4],
                "num_res_blocks": 1,
                "attn_resolutions": [4, 8],
                "dropout": 0.0,
                "resamp_with_conv": True,
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
                "ch": 32,
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
        lossconfig={"target": "modules.losses.vqperceptual_multidisc.DummyLoss"},
        vqconfig={
            "target": "modules.vector_quantization.quantize2_mask.VectorQuantize2",
            "params": {
                "codebook_size": 64,
                "codebook_dim": 32,
                "channel_last": False,
                "accept_image_fmap": True,
                "commitment_beta": 0.25,
                "decay": 0.99,
                "restart_unused_codes": True,
            },
        },
        quant_before_dim=32,
        quant_after_dim=32,
        quant_sample_temperature=0.0,
        image_size=resolution,
        entropy_patch_size=16,
    )


def _our_kwargs(kw):
    """Our bundle takes the same kwargs; force the non-pallas VQ path on CPU."""
    ours = dict(kw)
    ours["vqconfig"] = {
        "target": kw["vqconfig"]["target"],
        "params": {**kw["vqconfig"]["params"], "use_pallas": False},
    }
    ours["lossconfig"] = None
    return ours


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def _nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


@pytest.mark.parametrize("entropy_router", [True, False])
def test_dqvae_full_model_parity(ref, entropy_router):
    import jax

    from dynamicvectorquantization_tpu.models.dqvae import DualGrainVQModel
    from dynamicvectorquantization_tpu.utils.torch_ckpt import (
        convert_dqvae_state_dict,
    )

    kw = _model_kwargs(entropy_router)
    torch.manual_seed(0)
    ref_model = ref.dqvae_dual.DualGrainVQModel(**kw).eval()

    g = np.random.default_rng(42)
    x = (g.random((2, 3, 64, 64), dtype=np.float32) * 2.0 - 1.0)
    xt = torch.from_numpy(x)

    with torch.no_grad():
        r_quant, r_loss, r_info, r_idx, r_gate, r_ent = ref_model.encode(xt)
        r_dec = ref_model.decode(r_quant, r_idx)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = convert_dqvae_state_dict(sd)

    ours = DualGrainVQModel(**_our_kwargs(kw))
    o_quant, o_loss, o_info, o_idx, o_gate, o_ent = ours.encode(
        variables, _nhwc(x)
    )
    o_dec = ours.decode(variables, o_quant, o_idx)
    del jax  # only needed to ensure the backend is initialized via conftest

    # 1. patch entropy (KDE histogram)
    if entropy_router:
        np.testing.assert_allclose(
            np.asarray(o_ent), r_ent.numpy(), rtol=1e-4, atol=1e-4
        )
    # 2. grain routing decisions — exact
    np.testing.assert_array_equal(np.asarray(o_idx), r_idx.numpy())
    # 3. VQ code assignments — exact
    np.testing.assert_array_equal(np.asarray(o_info[2]), r_info[2].numpy())
    # 4. quantized features (reference NCHW)
    np.testing.assert_allclose(
        _nchw(o_quant), r_quant.numpy(), rtol=1e-3, atol=1e-4
    )
    # 5. commitment loss scalar
    np.testing.assert_allclose(float(o_loss), float(r_loss), rtol=1e-3, atol=1e-5)
    # 6. decoded image
    np.testing.assert_allclose(
        _nchw(o_dec), r_dec.numpy(), rtol=1e-3, atol=2e-3
    )


def test_dqvae_triple_grain_parity(ref):
    """Triple-grain feature-routed model (reference
    `models/stage1_dynamic/dqvae_triple_feat.py:17`), incl. the
    2layer-fc-SiLu router gate and the reference's decode() quirk of
    discarding grain_indices."""
    import importlib

    from dynamicvectorquantization_tpu.models.dqvae import TripleGrainVQModel
    from dynamicvectorquantization_tpu.utils.torch_ckpt import (
        convert_dqvae_state_dict,
    )

    ref_triple = importlib.import_module("models.stage1_dynamic.dqvae_triple_feat")

    kw = dict(
        encoderconfig={
            "target": "modules.dynamic_modules.EncoderTriple.TripleGrainEncoder",
            "params": {
                "ch": 32,
                "ch_mult": [1, 1, 2, 2, 4, 4],
                "num_res_blocks": 1,
                "attn_resolutions": [2, 4, 8],
                "dropout": 0.0,
                "resamp_with_conv": True,
                "in_channels": 3,
                "resolution": 64,
                "z_channels": 32,
                "router_config": {
                    "target": "modules.dynamic_modules.RouterTriple.TripleGrainFeatureRouter",
                    "params": {
                        "num_channels": 32,
                        "normalization_type": "group-32",
                        "gate_type": "2layer-fc-SiLu",
                    },
                },
            },
        },
        decoderconfig={
            "target": "modules.dynamic_modules.DecoderPositional.Decoder",
            "params": {
                "ch": 32,
                "in_ch": 32,
                "out_ch": 3,
                "ch_mult": [1, 1, 2, 2],
                "num_res_blocks": 1,
                "resolution": 64,
                "attn_resolutions": [8],
                "latent_size": 8,
                "window_size": 2,
                "position_type": "fourier+learned",
            },
        },
        lossconfig={"target": "modules.losses.vqperceptual_multidisc.DummyLoss"},
        vqconfig={
            "target": "modules.vector_quantization.quantize2_mask.VectorQuantize2",
            "params": {
                "codebook_size": 64,
                "codebook_dim": 32,
                "channel_last": False,
                "accept_image_fmap": True,
                "commitment_beta": 0.25,
                "decay": 0.99,
                "restart_unused_codes": True,
            },
        },
        quant_before_dim=32,
        quant_after_dim=32,
        quant_sample_temperature=0.0,
    )
    torch.manual_seed(0)
    ref_model = ref_triple.TripleGrainVQModel(**kw).eval()

    g = np.random.default_rng(3)
    x = g.random((2, 3, 64, 64), dtype=np.float32) * 2.0 - 1.0
    with torch.no_grad():
        r_quant, r_loss, r_info, r_idx, r_gate = ref_model.encode(
            torch.from_numpy(x)
        )
        r_dec = ref_model.decode(r_quant, r_idx)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = convert_dqvae_state_dict(sd)

    ours = TripleGrainVQModel(**{**_our_kwargs(kw), "image_size": 64})
    o_quant, o_loss, o_info, o_idx, o_gate, _ = ours.encode(variables, _nhwc(x))
    o_dec = ours.decode(variables, o_quant)

    np.testing.assert_array_equal(np.asarray(o_idx), r_idx.numpy())
    np.testing.assert_array_equal(np.asarray(o_info[2]), r_info[2].numpy())
    np.testing.assert_allclose(
        _nchw(o_quant), r_quant.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(float(o_loss), float(r_loss), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(_nchw(o_dec), r_dec.numpy(), rtol=1e-3, atol=2e-3)


def test_discriminator_parity(ref):
    """PatchGAN NLayerDiscriminator (reference
    `modules/discriminator/model.py:17`) through
    `convert_discriminator_state_dict`, BatchNorm eval semantics included."""
    import importlib

    import jax.numpy as jnp

    from dynamicvectorquantization_tpu.nn.discriminator import NLayerDiscriminator
    from dynamicvectorquantization_tpu.utils.torch_ckpt import (
        convert_discriminator_state_dict,
    )

    ref_disc_mod = importlib.import_module("modules.discriminator.model")
    torch.manual_seed(0)
    ref_d = ref_disc_mod.NLayerDiscriminator(
        input_nc=3, ndf=16, n_layers=3, use_actnorm=False
    ).eval()
    # randomize batchnorm running stats so eval normalization is exercised
    with torch.no_grad():
        for m in ref_d.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    g = np.random.default_rng(11)
    x = g.random((2, 3, 64, 64), dtype=np.float32) * 2.0 - 1.0
    with torch.no_grad():
        r_out = ref_d(torch.from_numpy(x))

    sd = {
        f"loss.discriminator.{k}": v.detach().numpy()
        for k, v in ref_d.state_dict().items()
    }
    variables = convert_discriminator_state_dict(sd, n_layers=3)

    ours = NLayerDiscriminator(ndf=16, n_layers=3)
    o_out = ours.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(_nhwc(x)),
    )
    np.testing.assert_allclose(_nchw(o_out), r_out.numpy(), rtol=1e-3, atol=1e-4)


def test_lpips_lin_heads_match_reference_vgg_pth():
    """The bundled lin-head asset equals the reference's actual vgg.pth
    (`modules/lpips/vgg.pth`) through `convert_lpips_weights`, and
    Stage1 default-loads it (VERDICT r1 item #2)."""
    from dynamicvectorquantization_tpu.nn.lpips import load_bundled_lin_heads
    from dynamicvectorquantization_tpu.utils.torch_ckpt import (
        convert_lpips_weights,
        load_torch_state_dict,
    )

    pth = REF_ROOT / "modules/lpips/vgg.pth"
    lin_sd = load_torch_state_dict(str(pth))
    converted = convert_lpips_weights(lin_sd=lin_sd)
    bundled = load_bundled_lin_heads()
    assert set(bundled) == {f"lin{i}" for i in range(5)}
    for i in range(5):
        np.testing.assert_array_equal(
            np.asarray(bundled[f"lin{i}"]["kernel"]),
            np.asarray(converted[f"lin{i}"]["kernel"]),
        )
        # all reference lin weights are non-negative post-training
        assert np.asarray(bundled[f"lin{i}"]["kernel"]).shape[3] == 1


@pytest.mark.slow  # compile-dominated on the 1-CPU host (suite-trim r03)
def test_stage1_init_uses_bundled_lin_heads(ref):
    """Stage1Trainer.init_state must land the real lin heads in the loss
    params by default (no env vars)."""
    import os

    from dynamicvectorquantization_tpu.nn.lpips import load_bundled_lin_heads

    assert not os.environ.get("DQVQ_LPIPS_LIN"), "test needs default env"
    import jax

    from dynamicvectorquantization_tpu.models.dqvae import DualGrainVQModel
    from dynamicvectorquantization_tpu.train.stage1 import Stage1Trainer

    kw = _model_kwargs(entropy_router=True)
    ours_kw = _our_kwargs(kw)
    ours_kw["lossconfig"] = {
        "target": "modules.losses.vqperceptual_multidisc.VQLPIPSWithDiscriminator",
        "params": {
            "disc_start": 0,
            "disc_config": {
                "target": "modules.discriminator.model.NLayerDiscriminator",
                "params": {"input_nc": 3, "ndf": 16, "n_layers": 3},
            },
        },
    }
    model = DualGrainVQModel(**ours_kw)
    trainer = Stage1Trainer(model, learning_rate=1e-4)
    state = trainer.init_state(jax.random.PRNGKey(0))
    got = state.loss_params["perceptual_loss"]
    want = load_bundled_lin_heads()
    for i in range(5):
        np.testing.assert_array_equal(
            np.asarray(got[f"lin{i}"]["kernel"]),
            np.asarray(want[f"lin{i}"]["kernel"]),
        )


def test_stackgpt_logits_parity(ref):
    import jax
    import jax.numpy as jnp

    from dynamicvectorquantization_tpu.nn.stackgpt import StackGPT
    from dynamicvectorquantization_tpu.utils.torch_ckpt import (
        convert_stackgpt_state_dict,
    )

    kw = dict(
        vocab_size=20,
        coarse_position_size=12,
        fine_position_size=20,
        segment_size=2,
        block_size=64,
        position_layer=2,
        content_layer=2,
        n_head=2,
        n_embd=16,
        embd_pdrop=0.0,
        resid_pdrop=0.0,
        attn_pdrop=0.0,
        content_pad_code=17,
        coarse_position_pad_code=9,
        fine_position_pad_code=17,
    )
    torch.manual_seed(0)
    ref_gpt = ref.stackgpt.StackGPT(**kw).eval()
    # pos_emb initializes to zeros — randomize so the mapping is exercised
    with torch.no_grad():
        ref_gpt.pos_emb.normal_(0.0, 0.02)

    g = np.random.default_rng(7)
    b, lc, lf = 2, 5, 6
    streams = dict(
        coarse_content=g.integers(0, 16, (b, lc)),
        fine_content=g.integers(0, 16, (b, lf)),
        coarse_position=g.integers(0, 9, (b, lc)),
        fine_position=g.integers(0, 16, (b, lf)),
        coarse_seg=np.zeros((b, lc), np.int64),
        fine_seg=np.ones((b, lf), np.int64),
    )
    t_streams = {k: torch.from_numpy(v.astype(np.int64)) for k, v in streams.items()}
    with torch.no_grad():
        r_out = ref_gpt(**t_streams)

    sd = {
        f"transformer.{k}": v.detach().numpy()
        for k, v in ref_gpt.state_dict().items()
    }
    variables = convert_stackgpt_state_dict(sd)

    ours = StackGPT(**kw)
    j_streams = {k: jnp.asarray(v, jnp.int32) for k, v in streams.items()}
    o_out = ours.apply(variables, **j_streams)

    np.testing.assert_allclose(
        np.asarray(o_out["position_logits"]),
        r_out["position_logits"].numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(o_out["content_logits"]),
        r_out["content_logits"].numpy(),
        rtol=1e-4,
        atol=1e-4,
    )

    # losses: targets with pad codes exercised (pad ignored in both impls)
    content = np.concatenate(
        [streams["coarse_content"], streams["fine_content"]], axis=1
    )[:, 1:].copy()
    content[0, -1] = kw["content_pad_code"]
    cpos_t = streams["coarse_position"][:, 1:].copy()
    cpos_t[0, -1] = kw["coarse_position_pad_code"]
    fpos_t = streams["fine_position"].copy()
    fpos_t[1, -1] = kw["fine_position_pad_code"]

    with torch.no_grad():
        r_losses = ref_gpt(
            **t_streams,
            content_target=torch.from_numpy(content),
            coarse_position_target=torch.from_numpy(cpos_t),
            fine_position_target=torch.from_numpy(fpos_t),
        )
    o_losses = ours.apply(
        variables,
        **j_streams,
        content_target=jnp.asarray(content, jnp.int32),
        coarse_position_target=jnp.asarray(cpos_t, jnp.int32),
        fine_position_target=jnp.asarray(fpos_t, jnp.int32),
    )
    for k in ("position_loss", "content_loss", "coarse_position_loss",
              "fine_position_loss"):
        np.testing.assert_allclose(
            float(o_losses[k]), float(r_losses[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )
    del jax

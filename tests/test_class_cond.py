"""Class-conditional Dualformer: training forward + sampling with class-token
bans (reference dqtransformer_class2_entropy.py semantics at toy scale)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.models.dqtransformer import ClassCondDualformer
from tests.test_dqtransformer import CODEBOOK, PERMUTER_CFG
from tests.test_dqvae import dual_config

N_CLASSES = 10
# class-cond vocab layout: [0..63 codes][64 pad][65 eos][66.. classes]
VOCAB = CODEBOOK + 2 + N_CLASSES  # 76
COARSE_POS = 16 + 2 + N_CLASSES  # 28
FINE_POS = 64 + 2 + N_CLASSES  # 76

TRANSFORMER_CFG = {
    "target": "modules.dynamic_modules.stackgpt.StackGPT",
    "params": {
        "vocab_size": VOCAB,
        "coarse_position_size": COARSE_POS,
        "fine_position_size": FINE_POS,
        "segment_size": 2,
        "block_size": 256,
        "position_layer": 2,
        "content_layer": 2,
        "n_head": 2,
        "n_embd": 32,
        "embd_pdrop": 0.0,
        "resid_pdrop": 0.0,
        "attn_pdrop": 0.0,
        "content_pad_code": CODEBOOK,
        "coarse_position_pad_code": 16,
        "fine_position_pad_code": 64,
        "activate_pad_ignore": True,
    },
}
COND_CFG = {
    "target": "modules.dynamic_modules.label_provider.ClassAwareSOSProvider",
    "params": {
        "n_classes": N_CLASSES,
        "threshold_content": CODEBOOK + 2,  # 66
        "threshold_coarse_position": 18,
        "threshold_fine_position": CODEBOOK + 2,
        "coarse_seg_sos": 0,
        "fine_seg_sos": 1,
    },
}


@pytest.fixture(scope="module")
def class_model():
    fs_cfg = dual_config(resolution=64, entropy_router=True)
    fs_cfg["vqconfig"]["params"]["codebook_size"] = CODEBOOK
    model = ClassCondDualformer(
        transformer_config=TRANSFORMER_CFG,
        first_stage_config={
            "target": "models.stage1_dynamic.dqvae_dual_entropy.DualGrainVQModel",
            "params": fs_cfg,
        },
        cond_stage_config=COND_CFG,
        permuter_config=PERMUTER_CFG,
    )
    fs_vars = model.first_stage_model.init(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), fs_vars)
    return model, variables


def test_class_cond_training_forward(class_model):
    model, variables = class_model
    assert model.cond_stage_key == "class_label"
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3), minval=-1, maxval=1)
    labels = jnp.array([3, 7])
    out = model.forward(variables, x, labels)
    assert np.isfinite(float(out["content_loss"]))
    assert np.isfinite(float(out["position_loss"]))


def test_class_cond_sampling_bans_class_tokens(class_model):
    model, variables = class_model
    labels = jnp.array([1, 9])
    c = model.encode_to_c(labels)
    # prefixes are the shifted class labels
    np.testing.assert_array_equal(np.asarray(c[0]).ravel(), [67, 75])

    cc, fc, cp, fp = model.sample_from_scratch(
        variables, *c, rng=jax.random.PRNGKey(3), top_k=40, top_k_pos=20,
    )
    cc_np, fc_np, cp_np, fp_np = map(np.asarray, (cc, fc, cp, fp))
    for arr, pad, eos in ((cc_np, CODEBOOK, CODEBOOK + 1), (fc_np, CODEBOOK, CODEBOOK + 1)):
        # contents are codes/pad/eos only — class tokens (>= 66) banned
        assert arr.max() <= eos, arr.max()
    # positions: no class-range tokens either
    assert cp_np.max() <= 17
    assert fp_np.max() <= 65

    img = model.decode_to_img(variables, cc, fc, cp, fp)
    assert img.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()

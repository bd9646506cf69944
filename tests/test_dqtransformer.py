"""Dualformer end-to-end on tiny shapes: train losses + KV-cached sampling +
decode_to_img (the full stage-2 slice, BASELINE config 4 at toy scale)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.models.dqtransformer import Dualformer
from tests.test_dqvae import dual_config

# tiny geometry: image 64 -> fine grid 8x8 (64 codes), coarse 4x4 (16)
CODEBOOK = 64
PERMUTER_CFG = {
    "target": "modules.dynamic_modules.permuter.DualGrainSeperatePermuter",
    "params": {
        "coarse_hw": 4,
        "fine_hw": 8,
        "content_pad_code": CODEBOOK,  # 64
        "content_eos_code": CODEBOOK + 1,  # 65
        "coarse_position_pad_code": 16,
        "coarse_position_eos_code": 17,
        "fine_position_pad_code": 64,
        "fine_position_eos_code": 65,
        "fine_position_order": "row-first",
    },
}
TRANSFORMER_CFG = {
    "target": "modules.dynamic_modules.stackgpt.StackGPT",
    "params": {
        "vocab_size": CODEBOOK + 3,  # +pad +eos +sos
        "coarse_position_size": 19,  # 16 +pad +eos +sos
        "fine_position_size": CODEBOOK + 3,
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
UNCOND_CFG = {
    "target": "modules.dynamic_modules.label_provider.PositionAwareSOSProvider",
    "params": {
        "coarse_sos": CODEBOOK + 2,  # 66
        "coarse_pos_sos": 18,
        "fine_sos": CODEBOOK + 2,
        "fine_pos_sos": CODEBOOK + 2,  # 66
        "coarse_seg_sos": 0,
        "fine_seg_sos": 1,
    },
}


@pytest.fixture(scope="session")
def dualformer():
    # session scope (suite-trim r05): test_trainer_parallel_axes imports
    # this fixture; module scope re-initialized the model per module. The
    # sp/pp tests that set model.transformer_train_apply restore it to
    # None in finally, so sharing across modules is safe.
    fs_cfg = dual_config(resolution=64, entropy_router=True)
    fs_cfg["vqconfig"]["params"]["codebook_size"] = CODEBOOK
    first_stage_config = {
        "target": "models.stage1_dynamic.dqvae_dual_entropy.DualGrainVQModel",
        "params": fs_cfg,
    }
    model = Dualformer(
        transformer_config=TRANSFORMER_CFG,
        first_stage_config=first_stage_config,
        uncond_stage_config=UNCOND_CFG,
        permuter_config=PERMUTER_CFG,
    )
    fs_vars = model.first_stage_model.init(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), fs_vars)
    return model, variables


def test_training_forward_losses(dualformer):
    model, variables = dualformer
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3), minval=-1, maxval=1)
    out = model.forward(variables, x, x)
    for k in ("position_loss", "content_loss"):
        assert np.isfinite(float(out[k])), k
    total = model.loss(out)
    assert np.isfinite(float(total))


def test_transformer_grads_flow_but_not_first_stage(dualformer):
    model, variables = dualformer
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3), minval=-1, maxval=1)

    def loss_fn(tparams):
        v = {
            "transformer": {**variables["transformer"], "params": tparams},
            "first_stage": variables["first_stage"],
        }
        return model.loss(model.forward(v, x, x))

    grads = jax.grad(loss_fn)(variables["transformer"]["params"])
    leaf_norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
    assert sum(leaf_norms) > 0


def test_sample_from_scratch_and_decode(dualformer):
    model, variables = dualformer
    b = 2
    dummy = jnp.zeros((b, 1))
    c = model.encode_to_c(dummy)

    cc, fc, cp, fp = model.sample_from_scratch(
        variables, *c, rng=jax.random.PRNGKey(3),
        temperature=1.0, top_k=30, top_k_pos=20,
    )
    assert cc.shape == (b, model.permuter.coarse_max_len)
    assert fp.shape == (b, model.permuter.fine_max_len)

    cc_np, cp_np, fp_np = map(np.asarray, (cc, cp, fp))
    for i in range(b):
        # coarse positions: valid prefix then eos then pads; no repeats
        valid = cp_np[i][cp_np[i] < 16]
        assert len(np.unique(valid)) == len(valid), "repeated coarse position"
        eos_pos = np.where(cp_np[i] == 17)[0]
        if len(eos_pos):
            assert (cp_np[i][eos_pos[0] + 1 :] == 16).all(), "non-pad after eos"
        # contents in valid region are real codes
        n_valid = len(valid)
        assert (cc_np[i][:n_valid] < CODEBOOK).all()
        # reference quirk: coarse position 15 (== hw1^2 - 1) is never sampled
        assert 15 not in valid

    # fine positions must avoid coarse-covered regions
    for i in range(b):
        covered = np.zeros((4, 4), bool)
        for p in cp_np[i][cp_np[i] < 16]:
            covered[p // 4, p % 4] = True
        covered_fine = np.repeat(np.repeat(covered, 2, 0), 2, 1).reshape(-1)
        valid_fp = fp_np[i][fp_np[i] < 64]
        assert not covered_fine[valid_fp].any(), "fine code placed on coarse region"
        assert len(np.unique(valid_fp)) == len(valid_fp)

    img = model.decode_to_img(variables, cc, fc, cp, fp)
    assert img.shape == (b, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_sample_fix_fine_position(dualformer):
    model, variables = dualformer
    b = 2
    c = model.encode_to_c(jnp.zeros((b, 1)))
    cc, fc, cp, fp = model.sample_from_scratch(
        variables, *c, rng=jax.random.PRNGKey(4), fix_fine_position=True,
        top_k=30, top_k_pos=20,
    )
    cp_np, fp_np = np.asarray(cp), np.asarray(fp)
    for i in range(b):
        n_coarse = (cp_np[i] < 16).sum()
        valid_fp = fp_np[i][fp_np[i] < 64]
        # deterministic schedule fills exactly the uncovered fine positions
        assert len(valid_fp) == 4 * (16 - n_coarse)
    img = model.decode_to_img(variables, cc, fc, cp, fp)
    assert img.shape == (b, 64, 64, 3)


def test_roundtrip_reconstruction_through_stage2_path(dualformer):
    """encode_to_z -> decode_to_img must equal stage-1 decode of the same
    codes (reference log_images reconstruction path)."""
    model, variables = dualformer
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3), minval=-1, maxval=1)
    quant, z = model.encode_to_z(variables, x)
    img2 = model.decode_to_img(
        variables, z["coarse_content"], z["fine_content"],
        z["coarse_position"], z["fine_position"],
    )
    dec_direct = model.first_stage_model.decode(variables["first_stage"], quant)
    np.testing.assert_allclose(
        np.asarray(img2), np.asarray(dec_direct), rtol=1e-4, atol=1e-4
    )

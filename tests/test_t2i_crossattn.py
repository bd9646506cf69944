"""t2i CONSUMING variant (`use_text_conditioning=True`): the content
transformer cross-attends to text features, so captions actually shift the
output — one notch beyond the reference, whose shipped t2i model computes
text features and drops them in StackGPT's ``**ignorekwargs``
(`/root/reference/models/stage2_dynamic/dqtransformer_t2i.py:221`,
`stackgpt.py:175`; QUIRKS #18). Default off = reference parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.models.dqtransformer import T2IDualformer
from tests.test_dqtransformer import (
    CODEBOOK, PERMUTER_CFG, TRANSFORMER_CFG, UNCOND_CFG,
)
from tests.test_dqvae import dual_config


def _build(use_text_conditioning):
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
        use_text_conditioning=use_text_conditioning,
    )
    fs_vars = model.first_stage_model.init(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), fs_vars)
    return model, variables


def test_text_shifts_losses_when_on_and_not_when_off():
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3),
                           minval=-1, maxval=1)
    capa = ["a red cat on grass", "a blue dog"]
    capb = ["stormy ocean waves", "quiet mountain snow"]

    on, von = _build(True)
    la = float(on.forward(von, x, capa)["content_loss"])
    lb = float(on.forward(von, x, capb)["content_loss"])
    assert np.isfinite(la) and np.isfinite(lb)
    assert la != lb, "captions must shift content logits when conditioning is on"

    off, voff = _build(False)
    la0 = float(off.forward(voff, x, capa)["content_loss"])
    lb0 = float(off.forward(voff, x, capb)["content_loss"])
    assert la0 == lb0, "reference-parity mode must ignore captions"


def test_flag_off_params_match_plain_model():
    """No extra params when off — checkpoints of the default model load
    unchanged."""
    off, voff = _build(False)
    flat = {jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_flatten_with_path(
                voff["transformer"]["params"])[0]}
    assert not any("xattn" in k or "text_proj" in k for k in flat)

    on, von = _build(True)
    flat_on = {jax.tree_util.keystr(k)
               for k, _ in jax.tree_util.tree_flatten_with_path(
                   von["transformer"]["params"])[0]}
    assert any("xattn" in k for k in flat_on)
    assert any("text_proj" in k for k in flat_on)
    # and the base parameter set is unchanged by the flag
    assert flat <= flat_on


def test_masked_caption_padding_is_inert():
    """Cross-attention must ignore masked (padding) caption slots: two
    captions equal up to padding give identical losses."""
    on, von = _build(True)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    feats, mask = on.text_encoder.encode_text(["a cat"])
    # corrupt features in masked slots; loss must not change
    noise = jnp.where(mask[..., None] > 0, 0.0, 7.7)
    _, z = on.encode_to_z(von, x)
    l1 = float(on.forward_tokens(von, z, z, text_memory=feats,
                                 text_mask=mask)["content_loss"])
    l2 = float(on.forward_tokens(von, z, z, text_memory=feats + noise,
                                 text_mask=mask)["content_loss"])
    assert l1 == pytest.approx(l2, abs=1e-6)

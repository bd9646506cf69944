"""Checkpoint converter round-trip: flax vars -> reference-style torch
state_dict -> flax vars must be the identity (validates every key mapping +
layout transpose both ways), plus StackGPT and discriminator converters on
synthesized reference-style state dicts."""
import jax
import numpy as np
import pytest

from dynamicvectorquantization_tpu.models.dqvae import DualGrainVQModel
from dynamicvectorquantization_tpu.utils.torch_ckpt import (
    convert_discriminator_state_dict,
    convert_dqvae_state_dict,
    convert_stackgpt_state_dict,
    export_dqvae_state_dict,
)
from tests.test_dqvae import dual_config


def _tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), (
        f"{path}: {sorted(a.keys())} != {sorted(b.keys())}"
    )
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}"
            )


@pytest.mark.parametrize("entropy_router", [True, False])
def test_dqvae_roundtrip(entropy_router):
    model = DualGrainVQModel(**dual_config(resolution=64, entropy_router=entropy_router))
    variables = model.init(jax.random.PRNGKey(0))
    sd = export_dqvae_state_dict(
        {"params": variables["params"], "ema": variables["ema"]}
    )
    # torch-style keys present
    assert "encoder.conv_in.weight" in sd
    assert "decoder.conv_out.bias" in sd
    assert "quantize.codebook.weight" in sd
    assert any(k.startswith("encoder.down.0.block.0.norm1") for k in sd)
    back = convert_dqvae_state_dict(sd)
    _tree_equal(variables["params"], back["params"])
    _tree_equal(variables["ema"], back["ema"])


def test_stackgpt_converter_on_synthesized_sd(rng):
    """Build a reference-style StackGPT state_dict with correct shapes and
    check it lands on our parameter tree exactly."""
    from tests.test_stackgpt import tiny_gpt, _streams

    gpt = tiny_gpt()
    streams = _streams(jax.random.PRNGKey(1))
    variables = gpt.init({"params": rng}, **streams)
    p = variables["params"]

    g = np.random.default_rng(0)
    sd = {}
    def rand_like(shape):
        return g.normal(size=shape).astype(np.float32)

    sd["transformer.content_emb.weight"] = rand_like(p["content_emb"]["embedding"].shape)
    sd["transformer.content_coarse_pos_emb.weight"] = rand_like(
        p["content_coarse_pos_emb"]["embedding"].shape)
    sd["transformer.content_fine_pos_emb.weight"] = rand_like(
        p["content_fine_pos_emb"]["embedding"].shape)
    sd["transformer.seg_emb.weight"] = rand_like(p["seg_emb"]["embedding"].shape)
    sd["transformer.pos_emb"] = rand_like(p["pos_emb"].shape)
    for stack, n in (("position_transformer", 2), ("content_transformer", 2)):
        for i in range(n):
            hp = p[stack][f"h_{i}"]
            for ln in ("ln1", "ln2"):
                sd[f"transformer.{stack}.{i}.{ln}.weight"] = rand_like(hp[ln]["scale"].shape)
                sd[f"transformer.{stack}.{i}.{ln}.bias"] = rand_like(hp[ln]["bias"].shape)
            for name in ("key", "query", "value", "proj"):
                k = hp["attn"][name]["kernel"]
                sd[f"transformer.{stack}.{i}.attn.{name}.weight"] = rand_like(k.shape[::-1])
                sd[f"transformer.{stack}.{i}.attn.{name}.bias"] = rand_like(
                    hp["attn"][name]["bias"].shape)
            sd[f"transformer.{stack}.{i}.mlp.0.weight"] = rand_like(
                hp["mlp_fc"]["kernel"].shape[::-1])
            sd[f"transformer.{stack}.{i}.mlp.0.bias"] = rand_like(hp["mlp_fc"]["bias"].shape)
            sd[f"transformer.{stack}.{i}.mlp.2.weight"] = rand_like(
                hp["mlp_proj"]["kernel"].shape[::-1])
            sd[f"transformer.{stack}.{i}.mlp.2.bias"] = rand_like(hp["mlp_proj"]["bias"].shape)
    for head in ("position_head", "content_head"):
        sd[f"transformer.{head}.0.weight"] = rand_like(p[f"{head}_ln"]["scale"].shape)
        sd[f"transformer.{head}.0.bias"] = rand_like(p[f"{head}_ln"]["bias"].shape)
        sd[f"transformer.{head}.1.weight"] = rand_like(p[head]["kernel"].shape[::-1])

    got = convert_stackgpt_state_dict(sd)["params"]

    def same_structure(a, b, path=""):
        assert set(a.keys()) == set(b.keys()), (path, sorted(a.keys()), sorted(b.keys()))
        for k in a:
            if isinstance(a[k], dict):
                same_structure(a[k], b[k], f"{path}/{k}")
            else:
                assert np.asarray(a[k]).shape == np.asarray(b[k]).shape, f"{path}/{k}"

    same_structure(p, got)
    # spot-check transposes
    np.testing.assert_allclose(
        got["position_transformer"]["h_0"]["attn"]["key"]["kernel"],
        sd["transformer.position_transformer.0.attn.key.weight"].T,
    )


def test_discriminator_converter_structure(rng):
    from dynamicvectorquantization_tpu.nn.discriminator import NLayerDiscriminator
    import jax.numpy as jnp

    d = NLayerDiscriminator(ndf=8, n_layers=3)
    x = jnp.zeros((1, 32, 32, 3))
    variables = d.init(rng, x)
    p = variables["params"]

    g = np.random.default_rng(0)
    sd = {}
    # sequential indices for n_layers=3: 0 conv, 2 conv, 3 bn, 5 conv, 6 bn,
    # 8 conv, 9 bn, 11 conv
    seq_convs = {0: "conv_0", 2: "conv_1", 5: "conv_2", 8: "conv_3", 11: "conv_out"}
    seq_norms = {3: "norm_1", 6: "norm_2", 9: "norm_3"}
    for seq, name in seq_convs.items():
        k = p[name]["kernel"]
        sd[f"loss.discriminator.main.{seq}.weight"] = g.normal(
            size=(k.shape[3], k.shape[2], k.shape[0], k.shape[1])).astype(np.float32)
        if "bias" in p[name]:
            sd[f"loss.discriminator.main.{seq}.bias"] = g.normal(
                size=p[name]["bias"].shape).astype(np.float32)
    for seq, name in seq_norms.items():
        c = p[name]["scale"].shape
        sd[f"loss.discriminator.main.{seq}.weight"] = g.normal(size=c).astype(np.float32)
        sd[f"loss.discriminator.main.{seq}.bias"] = g.normal(size=c).astype(np.float32)
        sd[f"loss.discriminator.main.{seq}.running_mean"] = np.zeros(c, np.float32)
        sd[f"loss.discriminator.main.{seq}.running_var"] = np.ones(c, np.float32)

    got = convert_discriminator_state_dict(sd, n_layers=3)
    assert set(got["params"].keys()) == set(p.keys())
    assert set(got["batch_stats"].keys()) == {"norm_1", "norm_2", "norm_3"}

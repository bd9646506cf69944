"""Legacy family: VQGAN baseline, quantizer variants, RQ bottleneck,
sequence permuters, minGPT + fixed-length transformers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicvectorquantization_tpu.models.legacy_transformer import (
    Labelator,
    SOSProvider,
    UncondTransformer,
)
from dynamicvectorquantization_tpu.models.vqgan import VQModel, RQModel
from dynamicvectorquantization_tpu.models import sequence_permuters as sp
from dynamicvectorquantization_tpu.nn.mingpt import GPT, sample_with_past
from dynamicvectorquantization_tpu.ops.quantizers import (
    GumbelQuantize,
    RQBottleneck,
    VectorQuantizer,
)

# resolution 16 with 3 levels (2 downsamples) -> 4x4 latent = 16 tokens
DD = dict(
    ch=16, ch_mult=[1, 2, 4], num_res_blocks=1, attn_resolutions=[4],
    dropout=0.0, in_channels=3, resolution=16, z_channels=16,
)


def test_vector_quantizer_gradients_reach_codebook(rng):
    vq = VectorQuantizer(n_e=16, e_dim=8, use_pallas=False)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    variables = vq.init(rng, z)

    def loss_fn(params):
        zq, loss, _ = vq.apply({"params": params}, z)
        return loss + jnp.mean(zq**2)

    g = jax.grad(loss_fn)(variables["params"])
    assert float(jnp.abs(g["embedding"]).max()) > 0


def test_gumbel_quantize(rng):
    gq = GumbelQuantize(num_hiddens=8, embedding_dim=8, n_embed=16)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    variables = gq.init({"params": rng, "gumbel": rng}, z)
    zq, kl, (_, _, idx) = gq.apply(variables, z, train=True,
                                   rngs={"gumbel": jax.random.PRNGKey(2)})
    assert zq.shape == z.shape and idx.shape == (2, 4, 4)
    assert np.isfinite(float(kl))


def test_rq_bottleneck_roundtrip(rng):
    rq = RQBottleneck(latent_shape=(4, 4, 8), code_shape=(4, 4, 3),
                      n_embed=32, use_pallas=False)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    variables = rq.init({"params": rng}, z)
    out, commit, (_, _, codes) = rq.apply(variables, z)
    assert out.shape == z.shape
    assert codes.shape == (2, 4, 4, 3)
    # deeper residual quantization reduces error vs single depth
    emb = rq.apply(variables, codes, method="get_codebook_entry")
    np.testing.assert_allclose(np.asarray(emb), np.asarray(out), atol=1e-5)


@pytest.mark.parametrize("cls", [sp.ZCurve, sp.Subsample, sp.SpiralOut,
                                 sp.SpiralIn, sp.Random, sp.AlternateParsing])
def test_sequence_permuter_roundtrip(cls):
    perm = cls(H=8, W=8)
    x = jnp.arange(2 * 64).reshape(2, 64)
    y = perm(x)
    back = perm(y, reverse=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    assert not np.array_equal(np.asarray(y), np.asarray(x))


def test_mingpt_cached_sampling_matches_forward(rng):
    gpt = GPT(vocab_size=32, block_size=32, n_layer=2, n_head=2, n_embd=16)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 32)
    variables = gpt.init({"params": rng}, tokens)
    logits_full, _ = gpt.apply(variables, tokens)

    cache = gpt.apply(variables, 2, 16, method="make_cache")
    step_logits = []
    for i in range(10):
        lg, cache = gpt.apply(variables, tokens[:, i], cache, jnp.int32(i), method="step")
        step_logits.append(lg)
    got = np.stack([np.asarray(l) for l in step_logits], 1)
    np.testing.assert_allclose(got, np.asarray(logits_full), rtol=1e-4, atol=1e-4)

    out = sample_with_past(gpt, variables, tokens[:, :2], steps=5,
                           rng=jax.random.PRNGKey(3), top_k=8)
    assert out.shape == (2, 5)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 32).all()


@pytest.fixture(scope="module")
def legacy_pipeline():
    fs_cfg = {
        "target": "models.stage1.vqgan.VQModel",
        "params": {
            "ddconfig": DD,
            "lossconfig": None,
            "n_embed": 32,
            "embed_dim": 16,
        },
    }
    model = UncondTransformer(
        transformer_config={
            "target": "modules.transformer.mingpt.GPT",
            "params": {"vocab_size": 33, "block_size": 32, "n_layer": 2,
                       "n_head": 2, "n_embd": 16},
        },
        first_stage_config=fs_cfg,
        permuter_config={"target": "modules.transformer.permuter.ZCurve",
                         "params": {"H": 4, "W": 4}},
        sos_token=32,
    )
    fs_vars = model.first_stage_model.init(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), fs_vars)
    return model, variables


def test_legacy_uncond_transformer_forward_and_sample(legacy_pipeline):
    model, variables = legacy_pipeline
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3), minval=-1, maxval=1)
    logits, loss = model.forward(variables, x, x)
    assert logits.shape == (2, 16, 33)
    assert np.isfinite(float(loss))

    c = model.encode_to_c(x)
    sampled = model.sample(variables, c, steps=16, rng=jax.random.PRNGKey(3), top_k=16)
    sampled = jnp.clip(sampled, 0, 31)
    img = model.decode_to_img(variables, sampled, (2, 4, 4))
    assert img.shape == (2, 16, 16, 3)


def test_labelator_and_sos():
    lab = Labelator(n_classes=10, threshold=100)
    c, _, info = lab.encode(jnp.array([3, 7]))
    np.testing.assert_array_equal(np.asarray(c).ravel(), [103, 107])
    sos = SOSProvider(sos_token=42)
    c, _, _ = sos.encode(jnp.zeros((3, 8, 8, 3)))
    assert (np.asarray(c) == 42).all()


def test_lucidrains_quantizer_kmeans_and_cosine(rng):
    import jax.numpy as jnp
    from dynamicvectorquantization_tpu.ops.quantize_lucidrains import (
        LucidrainsVectorQuantize,
    )

    for cosine in (False, True):
        vq = LucidrainsVectorQuantize(
            codebook_size=16, dim=8, use_cosine_sim=cosine, use_pallas=False,
            kmeans_iters=3,
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
        variables = vq.init({"params": rng, "vq": rng}, x)
        (xq, commit, (_, _, code)), mut = vq.apply(
            variables, x, train=True, mutable=["ema"],
            rngs={"vq": jax.random.PRNGKey(2)},
        )
        assert xq.shape == x.shape and code.shape == (2, 4, 4)
        assert bool(mut["ema"]["initted"])
        assert np.isfinite(float(commit))
        # kmeans init replaced the random-normal codebook on the first batch
        assert not np.allclose(
            np.asarray(variables["ema"]["embed"]), np.asarray(mut["ema"]["embed"])
        )
        _, commit2, _ = vq.apply({**variables, "ema": mut["ema"]}, x)
        assert np.isfinite(float(commit2))


def test_stacked_position_gpt(rng):
    import jax.numpy as jnp
    from dynamicvectorquantization_tpu.nn.stacked_mingpt import StackedPositionGPT

    gpt = StackedPositionGPT(vocab_size=20, position_size=18, block_size=32,
                             position_layer=2, value_layer=2, n_head=2, n_embd=16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 20)
    pos = jax.random.randint(jax.random.PRNGKey(2), (2, 9), 0, 18)
    variables = gpt.init({"params": rng}, idx, pos)
    out = gpt.apply(variables, idx, pos, idx_target=idx[:, 1:], pos_idx_target=pos[:, 1:])
    assert np.isfinite(float(out["position_loss"]))
    assert np.isfinite(float(out["value_loss"]))
    logits = gpt.apply(variables, idx, pos)
    assert logits["position_logits"].shape == (2, 8, 18)
    assert logits["value_logits"].shape == (2, 8, 20)


def test_vit_codec_and_position_aware_gpt(rng):
    from dynamicvectorquantization_tpu.nn.vit import (
        PositionAwareGPT,
        VisionTransformerDecoder,
        VisionTransformerEncoder,
    )

    enc = VisionTransformerEncoder(image_size=32, patch_size=8, embed_dim=16,
                                   depth=2, num_heads=2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1, maxval=1)
    ev = enc.init(rng, x)
    z = enc.apply(ev, x)
    assert z.shape == (2, 4, 4, 16)

    dec = VisionTransformerDecoder(image_size=32, patch_size=8, embed_dim=16,
                                   depth=2, num_heads=2)
    dv = dec.init(rng, z)
    y = dec.apply(dv, z)
    assert y.shape == (2, 32, 32, 3)

    gpt = PositionAwareGPT(vocab_size=20, position_size=16, block_size=32,
                           n_layer=2, n_head=2, n_embd=16)
    idx = jax.random.randint(jax.random.PRNGKey(2), (2, 9), 0, 20)
    pos = jax.random.randint(jax.random.PRNGKey(3), (2, 9), 0, 16)
    gv = gpt.init({"params": rng}, idx, pos)
    vl, pl = gpt.apply(gv, idx, pos)
    assert vl.shape == (2, 9, 20) and pl.shape == (2, 9, 16)

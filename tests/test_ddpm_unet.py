"""Smoke tests for the ported reference dead-code models
(`modules/diffusionmodules/model.py:195-340,540-776`): shapes, timestep
conditioning, registry resolution."""
import jax
import jax.numpy as jnp
import numpy as np

from dynamicvectorquantization_tpu.nn.ddpm_unet import (
    DDPMUNet, SimpleDecoder, UpsampleDecoder, VUNet, get_timestep_embedding,
)
from dynamicvectorquantization_tpu.utils.instantiate import get_obj_from_str


def test_timestep_embedding_matches_reference_semantics():
    emb = get_timestep_embedding(jnp.asarray([0, 1, 10]), 8)
    assert emb.shape == (3, 8)
    # t=0 -> sin part all zero, cos part all one
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 1.0, atol=1e-7)
    # odd dim zero-pads
    assert get_timestep_embedding(jnp.asarray([2]), 7).shape == (1, 7)


def test_ddpm_unet_shapes_and_timestep_effect():
    m = DDPMUNet(ch=16, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(8,), resolution=16, use_timestep=True)
    x = jnp.ones((2, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(0), x, jnp.asarray([0, 0]))
    y0 = m.apply(v, x, jnp.asarray([0, 0]))
    y1 = m.apply(v, x, jnp.asarray([5, 5]))
    assert y0.shape == (2, 16, 16, 3)
    assert not np.allclose(np.asarray(y0), np.asarray(y1)), "timestep must condition"


def test_vunet_shapes():
    m = VUNet(ch=16, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(), c_channels=3, z_channels=8, resolution=16)
    x = jnp.ones((1, 16, 16, 3))
    z = jnp.ones((1, 8, 8, 8))  # latent at the downsampled mid resolution
    v = m.init(jax.random.PRNGKey(0), x, z)
    assert m.apply(v, x, z).shape == (1, 16, 16, 3)


def test_simple_and_upsample_decoders():
    sd = SimpleDecoder(in_channels=8, out_channels=3)
    x = jnp.ones((1, 8, 8, 8))
    v = sd.init(jax.random.PRNGKey(0), x)
    assert sd.apply(v, x).shape == (1, 16, 16, 3)  # one 2x upsample

    ud = UpsampleDecoder(in_channels=8, out_channels=3, ch=8,
                         num_res_blocks=1, resolution=16, ch_mult=(2, 2))
    v = ud.init(jax.random.PRNGKey(1), x)
    assert ud.apply(v, x).shape == (1, 16, 16, 3)


def test_registry_targets_resolve():
    for tgt in (
        "modules.diffusionmodules.model.Model",
        "modules.diffusionmodules.model.VUNet",
        "modules.diffusionmodules.model.SimpleDecoder",
        "modules.diffusionmodules.model.UpsampleDecoder",
    ):
        assert get_obj_from_str(tgt) is not None

"""Numeric parity of backbone primitives against torch.nn (CPU).

These validate the semantics that matter for loading reference PyTorch
checkpoints: GroupNorm eps/grouping, asymmetric downsample padding, nearest
upsample, swish, and 3x3 SAME convs under the OIHW->HWIO kernel transpose.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import jax  # noqa: E402

from dynamicvectorquantization_tpu.nn.blocks import (  # noqa: E402
    Downsample,
    Normalize,
    ResnetBlock,
    Upsample,
    nonlinearity,
)


def _t2j_conv_kernel(w):
    # torch OIHW -> flax HWIO
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def _nhwc(x_nchw_t):
    return x_nchw_t.detach().numpy().transpose(0, 2, 3, 1)


def test_groupnorm_matches_torch(np_rng):
    x = np_rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    tgn = torch.nn.GroupNorm(32, 64, eps=1e-6, affine=True)
    with torch.no_grad():
        tgn.weight.uniform_(0.5, 1.5)
        tgn.bias.uniform_(-0.5, 0.5)
    want = _nhwc(tgn(_nchw(x)))

    m = Normalize(64)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    params = {
        "GroupNorm_0": {
            "scale": jnp.asarray(tgn.weight.detach().numpy()),
            "bias": jnp.asarray(tgn.bias.detach().numpy()),
        }
    }
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_downsample_asymmetric_padding_matches_torch(np_rng):
    x = np_rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
    tconv = torch.nn.Conv2d(8, 8, 3, stride=2, padding=0)
    xt = torch.nn.functional.pad(_nchw(x), (0, 1, 0, 1))
    want = _nhwc(tconv(xt))

    m = Downsample(8, with_conv=True)
    params = {
        "conv": {
            "kernel": _t2j_conv_kernel(tconv.weight),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    got = m.apply({"params": params}, jnp.asarray(x))
    assert got.shape == (1, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_downsample_s2d_rewrite_exact(np_rng):
    """The TPU space-to-depth rewrite of the stride-2 conv (same params,
    dense 2x2 kernel over packed 2x2 blocks) matches the native strided conv
    to f32 roundoff — including the asymmetric (0,1),(0,1) pad rows."""
    x = np_rng.normal(size=(2, 32, 32, 16)).astype(np.float32)
    m_native = Downsample(16, with_conv=True, s2d=False)
    variables = m_native.init(jax.random.PRNGKey(3), jnp.asarray(x))
    m_s2d = Downsample(16, with_conv=True, s2d=True)
    want = m_native.apply(variables, jnp.asarray(x))
    got = m_s2d.apply(variables, jnp.asarray(x))
    assert got.shape == want.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_downsample_custom_vjp_matches_direct_grad(np_rng):
    """strided_conv3x3_down routes its backward through jax.vjp of the
    native conv; gradients must match differentiating the native conv
    directly (the Pallas forward is inference/fwd-only acceleration)."""
    from dynamicvectorquantization_tpu.ops.downsample_pallas import (
        _native_strided_conv, strided_conv3x3_down)

    x = jnp.asarray(np_rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray(np_rng.normal(size=(3, 3, 8, 8)).astype(np.float32)) * 0.1
    b = jnp.asarray(np_rng.normal(size=(8,)).astype(np.float32)) * 0.1

    def loss_wrapped(x, w, b):
        return jnp.sum(strided_conv3x3_down(x, w, b) ** 2)

    def loss_native(x, w, b):
        return jnp.sum(_native_strided_conv(x, w, b) ** 2)

    gw = jax.grad(loss_wrapped, argnums=(0, 1, 2))(x, w, b)
    gn = jax.grad(loss_native, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(gw, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-5, atol=1e-5)


def test_upsample_nearest_matches_torch(np_rng):
    x = np_rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
    tconv = torch.nn.Conv2d(8, 8, 3, padding=1)
    xt = torch.nn.functional.interpolate(_nchw(x), scale_factor=2.0, mode="nearest")
    want = _nhwc(tconv(xt))

    m = Upsample(8, with_conv=True)
    params = {
        "conv": {
            "kernel": _t2j_conv_kernel(tconv.weight),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_swish_matches_torch(np_rng):
    x = np_rng.normal(size=(64,)).astype(np.float32)
    want = (torch.from_numpy(x) * torch.sigmoid(torch.from_numpy(x))).numpy()
    got = np.asarray(nonlinearity(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resnet_block_matches_torch_composition(np_rng):
    """ResnetBlock vs a torch re-composition of the same ops (norm-swish-conv
    x2 + 1x1 shortcut) with shared weights."""
    cin, cout = 32, 64
    x = np_rng.normal(size=(1, 8, 8, cin)).astype(np.float32)

    tn1 = torch.nn.GroupNorm(32, cin, eps=1e-6)
    tc1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
    tn2 = torch.nn.GroupNorm(32, cout, eps=1e-6)
    tc2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
    tsh = torch.nn.Conv2d(cin, cout, 1)
    for m in (tn1, tn2):
        with torch.no_grad():
            m.weight.uniform_(0.5, 1.5)
            m.bias.uniform_(-0.2, 0.2)

    def torch_swish(v):
        return v * torch.sigmoid(v)

    xt = _nchw(x)
    h = tc1(torch_swish(tn1(xt)))
    h = tc2(torch_swish(tn2(h)))
    want = _nhwc(tsh(xt) + h)

    params = {
        "norm1": {"GroupNorm_0": {
            "scale": jnp.asarray(tn1.weight.detach().numpy()),
            "bias": jnp.asarray(tn1.bias.detach().numpy()),
        }},
        "conv1": {
            "kernel": _t2j_conv_kernel(tc1.weight),
            "bias": jnp.asarray(tc1.bias.detach().numpy()),
        },
        "norm2": {"GroupNorm_0": {
            "scale": jnp.asarray(tn2.weight.detach().numpy()),
            "bias": jnp.asarray(tn2.bias.detach().numpy()),
        }},
        "conv2": {
            "kernel": _t2j_conv_kernel(tc2.weight),
            "bias": jnp.asarray(tc2.bias.detach().numpy()),
        },
        "nin_shortcut": {
            "kernel": _t2j_conv_kernel(tsh.weight),
            "bias": jnp.asarray(tsh.bias.detach().numpy()),
        },
    }
    m = ResnetBlock(in_channels=cin, out_channels=cout, dropout=0.0)
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

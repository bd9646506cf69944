"""Activation parity for the StyleGAN-family discriminators vs torch
replicas of the reference modules (`modules/discriminator/stylegan.py:283-357`
and `stylegan_lucidrains.py:85-126`), through the checkpoint converters.

The torch replicas mirror the reference module trees key-for-key (Blur is
re-expressed with F.pad+depthwise conv since kornia isn't available; its
normalized [1,2,1] kernel and reflect border match kornia.filter2d).
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from dynamicvectorquantization_tpu.nn.stylegan_discriminator import (
    LucidrainsDiscriminator,
    StyleGAN2Discriminator,
)
from dynamicvectorquantization_tpu.utils.torch_ckpt import (
    convert_lucidrains_disc_state_dict,
    convert_stylegan2_disc_state_dict,
)


def leaky():
    return tnn.LeakyReLU(0.2, inplace=True)


class TBlur(tnn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer("f", torch.tensor([1.0, 2.0, 1.0]))

    def forward(self, x):
        f = self.f
        k = f[None, :] * f[:, None]
        k = k / k.sum()
        c = x.shape[1]
        xp = F.pad(x, (1, 1, 1, 1), mode="reflect")
        return F.conv2d(xp, k.expand(c, 1, 3, 3), groups=c)


class TChanNorm(tnn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.g = tnn.Parameter(torch.ones(1, dim, 1, 1))
        self.b = tnn.Parameter(torch.zeros(1, dim, 1, 1))

    def forward(self, x):
        var = torch.var(x, dim=1, unbiased=False, keepdim=True)
        mean = torch.mean(x, dim=1, keepdim=True)
        return (x - mean) / (var + self.eps).sqrt() * self.g + self.b


class TPreNorm(tnn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.fn = fn
        self.norm = TChanNorm(dim)

    def forward(self, x):
        return self.fn(self.norm(x))


class TResidual(tnn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn(x) + x


class TDepthWiseConv2d(tnn.Module):
    def __init__(self, din, dout, k, padding=0, bias=True):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Conv2d(din, din, k, padding=padding, groups=din, bias=bias),
            tnn.Conv2d(din, dout, 1, bias=bias),
        )

    def forward(self, x):
        return self.net(x)


class TLinearAttention(tnn.Module):
    def __init__(self, dim, dim_head=64, heads=8):
        super().__init__()
        self.scale = dim_head ** -0.5
        self.heads = heads
        inner = dim_head * heads
        self.nonlin = tnn.GELU()
        self.to_q = tnn.Conv2d(dim, inner, 1, bias=False)
        self.to_kv = TDepthWiseConv2d(dim, inner * 2, 3, padding=1, bias=False)
        self.to_out = tnn.Conv2d(inner, dim, 1)

    def forward(self, fmap):
        h = self.heads
        b, _, x, y = fmap.shape
        q, k, v = (self.to_q(fmap), *self.to_kv(fmap).chunk(2, dim=1))

        def split(t):
            bb, c, xx, yy = t.shape
            return (
                t.reshape(bb, h, c // h, xx * yy).permute(0, 1, 3, 2)
                .reshape(bb * h, xx * yy, c // h)
            )

        q, k, v = map(split, (q, k, v))
        q = q.softmax(dim=-1) * self.scale
        k = k.softmax(dim=-2)
        context = torch.einsum("bnd,bne->bde", k, v)
        out = torch.einsum("bnd,bde->bne", q, context)
        out = (
            out.reshape(b, h, x * y, -1).permute(0, 1, 3, 2)
            .reshape(b, -1, x, y)
        )
        return self.to_out(self.nonlin(out))


def t_attn_and_ff(chan):
    return tnn.Sequential(
        TResidual(TPreNorm(chan, TLinearAttention(chan))),
        TResidual(TPreNorm(chan, tnn.Sequential(
            tnn.Conv2d(chan, chan * 2, 1), leaky(), tnn.Conv2d(chan * 2, chan, 1)
        ))),
    )


class TDiscBlock(tnn.Module):
    def __init__(self, cin, filters, downsample=True):
        super().__init__()
        self.conv_res = tnn.Conv2d(cin, filters, 1, stride=(2 if downsample else 1))
        self.net = tnn.Sequential(
            tnn.Conv2d(cin, filters, 3, padding=1), leaky(),
            tnn.Conv2d(filters, filters, 3, padding=1), leaky(),
        )
        self.downsample = tnn.Sequential(
            TBlur(), tnn.Conv2d(filters, filters, 3, padding=1, stride=2)
        ) if downsample else None

    def forward(self, x):
        res = self.conv_res(x)
        x = self.net(x)
        if self.downsample is not None:
            x = self.downsample(x)
        return (x + res) * (1 / math.sqrt(2))


class TStyleGAN2Disc(tnn.Module):
    def __init__(self, image_size, network_capacity=16, attn_layers=(),
                 fmap_max=512):
        super().__init__()
        num_layers = int(math.log2(image_size) - 1)
        filters = [3] + [
            min((network_capacity * 4) * (2 ** i), fmap_max)
            for i in range(num_layers + 1)
        ]
        pairs = list(zip(filters[:-1], filters[1:]))
        blocks, attns = [], []
        for ind, (cin, cout) in enumerate(pairs):
            is_not_last = ind != len(pairs) - 1
            blocks.append(TDiscBlock(cin, cout, downsample=is_not_last))
            attns.append(t_attn_and_ff(cout) if (ind + 1) in tuple(attn_layers)
                         else tnn.Identity())
        self.blocks = tnn.ModuleList(blocks)
        self.attn_blocks = tnn.ModuleList(attns)
        chan_last = filters[-1]
        self.final_conv = tnn.Conv2d(chan_last, chan_last, 3, padding=1)
        self.to_logit = tnn.Linear(2 * 2 * chan_last, 1)

    def forward(self, x):
        for block, attn in zip(self.blocks, self.attn_blocks):
            x = block(x)
            x = attn(x)
        x = self.final_conv(x)
        x = x.reshape(x.shape[0], -1)
        return self.to_logit(x).squeeze()


def test_stylegan2_parity():
    torch.manual_seed(0)
    tmodel = TStyleGAN2Disc(image_size=32, network_capacity=2,
                            attn_layers=(2,), fmap_max=32).eval()
    x = torch.randn(3, 3, 32, 32)
    with torch.no_grad():
        ref = tmodel(x).numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_stylegan2_disc_state_dict(sd)
    model = StyleGAN2Discriminator(image_size=32, network_capacity=2,
                                   attn_layers=(2,), fmap_max=32)
    out = model.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------- lucidrains


class TCrossEmbed(tnn.Module):
    def __init__(self, din, kernel_sizes, dout, stride=1):
        super().__init__()
        ks = sorted(kernel_sizes)
        dim_scales = [dout // (2 ** i) for i in range(1, len(ks))]
        dim_scales = dim_scales + [dout - sum(dim_scales)]
        self.convs = tnn.ModuleList([
            tnn.Conv2d(din, d, k, stride=stride, padding=(k - stride) // 2)
            for k, d in zip(ks, dim_scales)
        ])

    def forward(self, x):
        return torch.cat([c(x) for c in self.convs], dim=1)


class TResnetBlockInner(tnn.Module):
    def __init__(self, dim, groups):
        super().__init__()
        self.groupnorm = tnn.GroupNorm(groups, dim)
        self.activation = tnn.LeakyReLU(0.1)
        self.project = tnn.Conv2d(dim, dim, 3, padding=1)

    def forward(self, x):
        return self.project(self.activation(self.groupnorm(x)))


class TResnetBlock(tnn.Module):
    def __init__(self, dim, groups):
        super().__init__()
        self.block = TResnetBlockInner(dim, groups)
        self.res_conv = tnn.Identity()

    def forward(self, x):
        return self.block(x) + self.res_conv(x)


class TLucidDisc(tnn.Module):
    def __init__(self, dim=16, discr_layers=2, channels=3, groups=4,
                 cross_embed_kernel_sizes=(3, 7, 15)):
        super().__init__()
        layer_dims = [dim * (2 ** t) for t in range(discr_layers)]
        dims = (dim, *layer_dims)
        init_dim, final_dim = dims[0], dims[-1]
        self.layers = tnn.ModuleList([tnn.Sequential(
            TCrossEmbed(channels, cross_embed_kernel_sizes, init_dim, stride=1),
            tnn.LeakyReLU(0.1),
        )])
        for din, dout in zip(dims[:-1], dims[1:]):
            self.layers.append(tnn.Sequential(
                tnn.Conv2d(din, dout, 4, stride=2, padding=1),
                tnn.LeakyReLU(0.1),
                tnn.GroupNorm(groups, dout),
                TResnetBlock(dout, groups),
            ))
        self.to_logits = tnn.Sequential(
            tnn.Conv2d(final_dim, final_dim, 1),
            tnn.LeakyReLU(0.1),
            tnn.Conv2d(final_dim, 1, 4),
        )

    def forward(self, x):
        for net in self.layers:
            x = net(x)
        return self.to_logits(x)


def test_lucidrains_parity():
    torch.manual_seed(1)
    tmodel = TLucidDisc(dim=16, discr_layers=2, groups=4).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = tmodel(x).numpy()  # NCHW (2, 1, 5, 5)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_lucidrains_disc_state_dict(sd)
    model = LucidrainsDiscriminator(dim=16, discr_layers=2, groups=4)
    out = model.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref, rtol=2e-4, atol=2e-4)

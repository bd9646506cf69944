"""Canonical VQGAN conv/attention blocks, NHWC flax modules.

Semantics mirror the reference's `modules/diffusionmodules/model.py:29-192`
exactly (these details matter for loading PyTorch checkpoints):

  * swish nonlinearity (`model.py:29-31`);
  * GroupNorm(32 groups, eps=1e-6, affine) (`model.py:34-35`);
  * Upsample = nearest x2 + 3x3 conv (`model.py:38-53`);
  * Downsample = asymmetric (0,1),(0,1) zero pad + 3x3 stride-2 VALID conv
    (`model.py:56-75` — "no asymmetric padding in torch conv, must do it
    ourselves");
  * ResnetBlock norm-swish-conv x2 with 1x1 (or 3x3) shortcut
    (`model.py:78-137`);
  * AttnBlock: 1x1-conv q/k/v over the full HW x HW map (`model.py:140-192`).

Layout is NHWC (TPU-native). Torch OIHW kernels transpose to HWIO on load
(see `utils.torch_ckpt`).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def nonlinearity(x):
    return x * jax.nn.sigmoid(x)  # swish


def _num_groups(channels: int, target: int = 32) -> int:
    """32 groups (torch GroupNorm(32, C)) whenever divisible — true for every
    reference config; smaller test configs fall back to the largest divisor
    <= target so tiny-channel unit tests can run."""
    if channels % target == 0:
        return target
    g = min(target, channels)
    while channels % g != 0:
        g -= 1
    return g


class GroupNorm32(nn.Module):
    """GroupNorm(32, eps=1e-6) with adaptive groups for tiny test configs.

    `dtype` sets the OUTPUT/compute dtype (bf16 path halves the HBM traffic
    of the norm+swish chains that dominate the encoder's non-MXU time);
    flax always computes the group statistics in float32 regardless."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=_num_groups(x.shape[-1]), epsilon=1e-6,
                            dtype=self.dtype)(x)


class Normalize(nn.Module):
    """GroupNorm(32) matching torch defaults used by the reference."""

    num_channels: int  # kept for parity with reference ctor; flax infers it

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=_num_groups(x.shape[-1]), epsilon=1e-6)(x)


class Upsample(nn.Module):
    in_channels: int
    with_conv: bool = True
    dtype: Any = None  # conv compute dtype (bf16 path); params stay f32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest x2
        if self.with_conv:
            x = nn.Conv(self.in_channels, (3, 3), padding="SAME",
                        dtype=self.dtype, name="conv")(x)
        return x


class _StridedConv3x3(nn.Module):
    """3x3 stride-2 conv with the reference's (0,1),(0,1) zero pad — param
    tree identical to ``nn.Conv`` (kernel (3,3,C,K) + bias), but on TPU the
    computation is rewritten space-to-depth.

    Why it exists: XLA's native stride-2 conv at the encoder's 128-channel
    levels runs at ~16% true MXU efficiency (r05 xplane: down_0_downsample
    10.1 ms/step vs a 1.6 ms FLOP floor at batch 64). The exact rewrite —
    pack 2x2 spatial blocks into channels, lift the 3x3/stride-2 kernel into
    a dense 2x2/stride-1 kernel over 4C inputs (the MLPerf TPU ResNet conv-1
    trick) — was the first attempt, but MEASURED SLOWER than the native
    strided conv on this chip (16.25 vs 7.65 ms standalone at batch 64;
    headline 880 vs 1040 img/s): the space-to-depth transpose is a full
    HBM relayout that XLA cannot fuse away, and it dominates the dense-conv
    win. Polyphase decomposition (17.0 ms) and W-only channel packing
    (11.3 ms) lose the same way. Kept OPT-IN (``s2d=True``) as documentation
    of the measured dead end; default is the native strided conv.

      y[i,j] = sum_{u,v<3} w[u,v] x[2i+u, 2j+v]
             = sum_{da,db<2} w2[da,db] z[i+da, j+db],
      z[a,b,(p,q,c)] = x[2a+p, 2b+q, c],  w2[da,db,(p,q,c),k] = wpad[2da+p, 2db+q, c, k]

    Accumulation order differs from the direct conv (same exact taps), so
    f32 results agree to roundoff, not bitwise; ``s2d=False`` restores the
    native strided conv (always used on non-TPU backends by default).
    """

    features: int
    dtype: Any = None
    s2d: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        use_s2d = bool(self.s2d)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        else:
            x = x.astype(kernel.dtype)
        if not use_s2d:
            # strided_conv3x3_down: Pallas kernel on the TPU bf16 path
            # (XLA's native strided conv is ~16% MXU-efficient there),
            # native XLA conv otherwise; DQVQ_DS_KERNEL=0 forces native
            from ..ops.downsample_pallas import strided_conv3x3_down

            return strided_conv3x3_down(x, kernel, bias)
        b, h, w, _ = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        z = (
            x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, w // 2, 4 * c)
        )
        wpad = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (4,4,C,K)
        w2 = (
            wpad.reshape(2, 2, 2, 2, c, self.features)  # (da,p,db,q,C,K)
            .transpose(0, 2, 1, 3, 4, 5)  # (da,db,p,q,C,K)
            .reshape(2, 2, 4 * c, self.features)
        )
        dn2 = jax.lax.conv_dimension_numbers(
            z.shape, w2.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            z, w2, window_strides=(1, 1), padding=((0, 1), (0, 1)),
            dimension_numbers=dn2,
        )
        return y + bias


class Downsample(nn.Module):
    in_channels: int
    with_conv: bool = True
    dtype: Any = None
    s2d: Optional[bool] = None  # None = auto (TPU only); see _StridedConv3x3

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            # reference pads (left=0, right=1, top=0, bottom=1) then VALID
            x = _StridedConv3x3(
                self.in_channels, dtype=self.dtype, s2d=self.s2d, name="conv"
            )(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class ResnetBlock(nn.Module):
    in_channels: int
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    temb_channels: int = 0
    dtype: Any = None  # conv compute dtype; GroupNorm always runs f32

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True):
        out_ch = self.out_channels or self.in_channels
        h = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        h = nonlinearity(h)
        h = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)

        if temb is not None:
            h = h + nn.Dense(out_ch, dtype=self.dtype, name="temb_proj")(
                nonlinearity(temb))[:, None, None, :]

        h = GroupNorm32(dtype=self.dtype, name="norm2")(h)
        h = nonlinearity(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)

        if self.in_channels != out_ch:
            if self.conv_shortcut:
                x = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name="conv_shortcut")(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return (x + h).astype(x.dtype) if self.dtype is None else x.astype(self.dtype) + h


class AttnBlock(nn.Module):
    in_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        h_ = GroupNorm32(dtype=self.dtype, name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h_).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h_).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h_).reshape(b, h * w, c)

        if (
            jax.default_backend() == "tpu"
            and h * w <= 2048
            and c % 128 == 0
        ):
            # single-head full attention over HW tokens: the (T, T) score
            # map at 32^2 is B x 1024^2 f32 (~4 MB/img) that the naive path
            # round-trips through HBM three times; the Pallas kernel keeps
            # it in VMEM (causal=False -> no mask)
            from ..ops.attention_pallas import fused_causal_attention

            h_ = fused_causal_attention(
                q, k, v, 0, 1, 0.0, c ** -0.5, False, False
            ).reshape(b, h, w, c)
        else:
            attn = jnp.einsum("bic,bjc->bij", q, k) * (c ** -0.5)
            # softmax stays f32 even on the bf16 path: measured
            # neutral-to-slower in bf16 (968 vs 978 img/s headline) — XLA
            # already fuses the casts
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
            h_ = jnp.einsum("bij,bjc->bic", attn, v).reshape(b, h, w, c)
        h_ = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h_)
        return (x.astype(h_.dtype) + h_)

"""LPIPS perceptual loss: frozen VGG16 features + learned 1x1 lin heads.

Reference: `modules/losses/lpips.py` — channel-normalize each of the five
VGG16 relu taps (relu1_2/2_2/3_3/4_3/5_3), squared difference, 1x1 lin head,
spatial average, sum over taps. Inputs in [-1, 1], shifted/scaled by fixed
constants first.

Weights: the reference downloads torchvision's pretrained VGG16 plus the
taming-transformers lin heads (`modules/lpips/vgg.pth`, 5 tensors). The lin
heads are bundled with this package (assets/lpips/vgg_lin.npz, loaded by
default — see `load_bundled_lin_heads`). The VGG16 backbone is external:
point ``lpips_vgg_path`` / env ``DQVQ_LPIPS_VGG`` at a torchvision vgg16
state_dict for full parity; without it the backbone falls back to seeded
random features — still a useful training gradient, but rFID parity with
reference checkpoints requires the real backbone (documented in QUIRKS.md).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# VGG16 feature config up to relu5_3; "M" = 2x2 maxpool
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
# taps after the ReLU of these conv indices (relu1_2, 2_2, 3_3, 4_3, 5_3)
_TAP_AFTER_CONV = [1, 3, 6, 9, 12]

_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        taps = []
        conv_idx = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                if conv_idx in _TAP_AFTER_CONV:
                    taps.append(x)
                conv_idx += 1
        return taps


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    use_dropout: bool = True  # dropout is inert at eval; kept for ckpt parity

    @nn.compact
    def __call__(self, input, target):
        net = VGG16Features(name="net")
        x0 = (input - _SHIFT) / _SCALE
        x1 = (target - _SHIFT) / _SCALE
        taps0 = net(x0)
        taps1 = net(x1)
        val = 0.0
        for i, (f0, f1) in enumerate(zip(taps0, taps1)):
            d = (_normalize_tensor(f0) - _normalize_tensor(f1)) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(d)
            val = val + jnp.mean(lin, axis=(1, 2), keepdims=True)
        return val  # (B, 1, 1, 1)


def load_bundled_lin_heads() -> dict:
    """The reference's learned LPIPS lin-head weights (its
    `modules/lpips/vgg.pth`, 5 tensors of 1472 floats total), bundled at
    assets/lpips/vgg_lin.npz in flax HWIO layout. Loaded by default by
    Stage1Trainer.init_state so training uses the real perceptual heads."""
    import os

    import numpy as np

    path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "assets", "lpips", "vgg_lin.npz"
    )
    data = np.load(path)
    return {k: {"kernel": jnp.asarray(data[k])} for k in data.files}

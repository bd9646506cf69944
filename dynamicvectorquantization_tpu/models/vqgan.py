"""Legacy fixed-length stage-1 baselines: VQGAN, multi-VQ VQGAN, RQ-VAE.

Reference: `models/stage1/vqgan.py:20-220` (VQModel),
`models/stage1/vqgan_multivq.py:16` (several quantizers over channel splits),
`models/stage1/rqvae.py:42` (RQBottleneck stage 1).

All expose the same bundle API as the dynamic models (`models/dqvae.py`), so
`train/stage1.py` trains them unchanged: forward returns
(dec, diff, grain_indices=None-like, gate=None, x_entropy=None).
"""
from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.instantiate import instantiate_from_config
from .dqvae import _VQModelBundle


class VQGANNet(nn.Module):
    """encoder -> 1x1 -> quantize -> 1x1 -> decoder (single grain)."""

    ddconfig: Mapping[str, Any]
    vqconfig: Mapping[str, Any]
    embed_dim: int

    def setup(self):
        from ..nn.vqgan_codec import VQGANDecoder, VQGANEncoder

        dd = dict(self.ddconfig)
        dd.pop("double_z", None)
        # reference ddconfigs carry decoder-only keys (out_ch) alongside the
        # shared ones; route each module only the fields it declares
        enc_fields = set(VQGANEncoder.__dataclass_fields__)
        dec_fields = set(VQGANDecoder.__dataclass_fields__)
        self.encoder = VQGANEncoder(**{k: v for k, v in dd.items()
                                       if k in enc_fields})
        self.decoder = VQGANDecoder(**{k: v for k, v in dd.items()
                                       if k in dec_fields})
        self.quantize = instantiate_from_config(self.vqconfig)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(
            self.ddconfig["z_channels"], (1, 1), name="post_quant_conv"
        )

    def encode(self, x, train: bool = False):
        h = self.encoder(x, deterministic=not train)
        h = self.quant_conv(h)
        quant, emb_loss, info = self.quantize(h, train=train)
        # match the dynamic models' 6-tuple surface (no grains/gate/entropy)
        return quant, emb_loss, info, None, None, None

    def decode(self, quant, grain_indices=None, train: bool = False,
               return_pre_out: bool = False):
        quant = self.post_quant_conv(quant)
        return self.decoder(quant, deterministic=not train,
                            return_pre_out=return_pre_out)

    def __call__(self, x, train: bool = False, return_pre_out: bool = False):
        quant, diff, info, *_ = self.encode(x, train=train)
        dec = self.decode(quant, train=train, return_pre_out=return_pre_out)
        return dec, diff, info[2], None, None

    def get_code_emb_with_depth(self, code):
        return self.quantize.get_codebook_entry(code)


class VQModel(_VQModelBundle):
    """Fixed-length VQGAN baseline (reference `models/stage1/vqgan.py`)."""

    def __init__(self, ddconfig, lossconfig, vqconfig=None, n_embed=None,
                 embed_dim=None, ckpt_path=None, ignore_keys=(),
                 image_key="image", monitor=None, warmup_epochs=0,
                 loss_with_epoch=True, scheduler_type="linear-warmup_cosine-decay",
                 **kwargs):
        if vqconfig is None:
            vqconfig = {
                "target": "dynamicvectorquantization_tpu.ops.quantizers.VectorQuantizer",
                "params": {"n_e": n_embed or 1024, "e_dim": embed_dim or 256},
            }
        embed_dim = embed_dim or (vqconfig.get("params") or {}).get(
            "e_dim", ddconfig["z_channels"]
        )
        self.net = VQGANNet(ddconfig=ddconfig, vqconfig=vqconfig, embed_dim=embed_dim)
        self.loss = instantiate_from_config(lossconfig) if lossconfig else None
        self.image_key = image_key
        self.monitor = monitor
        self.warmup_epochs = warmup_epochs
        self.loss_with_epoch = loss_with_epoch
        self.scheduler_type = scheduler_type
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)
        self.image_size = ddconfig.get("resolution", 256)
        self.learning_rate = None
        self.min_learning_rate = 0.0
        self.steps_per_epoch = None
        self.training_steps = None

    def log_images(self, variables, batch, **kwargs):
        import numpy as np

        x = self.get_input(batch, self.image_key)
        xrec, *_ = self.forward(variables, x)
        return {"inputs": np.asarray(x), "reconstructions": np.asarray(xrec)}


class MultiVQModel(_VQModelBundle):
    """Multi-VQ VQGAN (reference `models/stage1/vqgan_multivq.py:16`):
    structurally the single-grain codec with an encoderconfig/decoderconfig
    pair and a list-returning quantizer config."""

    def __init__(self, encoderconfig, decoderconfig, lossconfig, vqconfig,
                 quant_before_dim, quant_after_dim, ckpt_path=None,
                 ignore_keys=(), image_key="image", monitor=None,
                 warmup_epochs=0, loss_with_epoch=True,
                 scheduler_type="linear-warmup_cosine-decay", **kwargs):
        ddconfig = dict(encoderconfig.get("params") or {})
        self.net = VQGANNet(ddconfig=ddconfig, vqconfig=vqconfig,
                            embed_dim=quant_after_dim)
        self.loss = instantiate_from_config(lossconfig) if lossconfig else None
        self.image_key = image_key
        self.monitor = monitor
        self.warmup_epochs = warmup_epochs
        self.loss_with_epoch = loss_with_epoch
        self.scheduler_type = scheduler_type
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)
        self.image_size = ddconfig.get("resolution", 256)
        self.learning_rate = None
        self.min_learning_rate = 0.0
        self.steps_per_epoch = None
        self.training_steps = None


class RQModel(VQModel):
    """RQ-VAE baseline (reference `models/stage1/rqvae.py:42`): same codec with
    a residual-quantization bottleneck; code shape (B, H, W, depth)."""

    def __init__(self, ddconfig, lossconfig, rqconfig=None, **kwargs):
        vqconfig = rqconfig or {
            "target": "dynamicvectorquantization_tpu.ops.quantizers.RQBottleneck",
            "params": {},
        }
        super().__init__(ddconfig, lossconfig, vqconfig=vqconfig, **kwargs)

"""Stage-1 DQ-VAE models (dual- and triple-grain).

Public surface mirrors the reference LightningModules
(`models/stage1_dynamic/dqvae_dual_entropy.py:65-262`,
`dqvae_dual_feat.py`, `dqvae_triple_feat.py`):

  encode(x)  -> (quant, emb_loss, info, grain_indices, gate, x_entropy)
  decode(q)  -> image
  __call__(x)-> (dec, diff, grain_indices, gate, x_entropy)
  get_code_emb_with_depth(code) -> codebook embeddings

Design: the network is a single flax Module (`DQVAENet`). The config-level
classes (`DualGrainVQModel`, `TripleGrainVQModel`) are thin bundles holding
the net, the (separately-optimized) GAN loss module, and training
hyperparameters — the JAX analog of the reference's LightningModule split
into functional pieces. Whether patch entropy is computed is decided by the
router target in the config (the reference has separate `_entropy` / `_feat`
model files for this).

Layout is NHWC throughout (TPU-native); `get_input` converts HWC/CHW batches.
"""
from __future__ import annotations

from typing import Any, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.entropy import patch_entropy
from ..utils.instantiate import instantiate_from_config
from ..config.registry import resolve_target


def _is_entropy_router(encoderconfig) -> bool:
    router = (encoderconfig.get("params") or {}).get("router_config") or {}
    target = router.get("target", "")
    return "FixedEntropyRouter" in resolve_target(target)


class DQVAENet(nn.Module):
    """Encoder -> 1x1 quant conv -> masked EMA VQ -> 1x1 post conv -> decoder."""

    encoderconfig: Mapping[str, Any]
    decoderconfig: Mapping[str, Any]
    vqconfig: Mapping[str, Any]
    quant_before_dim: int
    quant_after_dim: int
    quant_sample_temperature: float = 0.0
    entropy_patch_size: int = 16
    image_size: int = 256
    use_entropy: bool = True
    feature_key: str = "h_dual"  # "h_triple" for the triple-grain encoder
    compute_dtype: Optional[str] = None  # "bfloat16" = MXU-native conv path

    def _with_dtype(self, cfg):
        if not self.compute_dtype:
            return cfg
        cfg = dict(cfg)
        cfg["params"] = {**(cfg.get("params") or {}), "dtype": jnp.dtype(self.compute_dtype)}
        return cfg

    def setup(self):
        self.encoder = instantiate_from_config(self._with_dtype(self.encoderconfig))
        self.decoder = instantiate_from_config(self._with_dtype(self.decoderconfig))
        self.quantize = instantiate_from_config(self.vqconfig)
        # the 1x1 quant convs follow the compute dtype: with bf16 towers a
        # dtype-less Conv promotes its input back to f32 (cast traffic +
        # quarter-rate f32 MXU); the VQ kernel re-casts to f32 either way
        qdtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        self.quant_conv = nn.Conv(
            self.quant_after_dim, (1, 1), dtype=qdtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.quant_before_dim, (1, 1), dtype=qdtype, name="post_quant_conv"
        )

    def encode(self, x, train: bool = False):
        x_entropy = None
        if self.use_entropy:
            x_entropy = patch_entropy(x, self.entropy_patch_size)
            x_entropy = jax.lax.stop_gradient(x_entropy)
        h_dict = self.encoder(x, x_entropy, train=train)
        h = h_dict[self.feature_key]
        grain_indices = h_dict["indices"]
        codebook_mask = h_dict["codebook_mask"]
        gate = h_dict["gate"]

        h = self.quant_conv(h)
        quant, emb_loss, info = self.quantize(
            h,
            codebook_mask=codebook_mask,
            temp=self.quant_sample_temperature,
            train=train,
        )
        return quant, emb_loss, info, grain_indices, gate, x_entropy

    def decode(self, quant, grain_indices=None, train: bool = False, return_pre_out: bool = False):
        quant = self.post_quant_conv(quant)
        return self.decoder(
            quant,
            grain_indices,
            deterministic=not train,
            return_pre_out=return_pre_out,
        )

    def __call__(self, x, train: bool = False, return_pre_out: bool = False):
        quant, diff, info, grain_indices, gate, x_entropy = self.encode(x, train=train)
        dec = self.decode(
            quant, grain_indices, train=train, return_pre_out=return_pre_out
        )
        return dec, diff, grain_indices, gate, x_entropy

    def get_code_emb_with_depth(self, code):
        """Codebook lookup for decode-from-indices (stage 2 sampling path;
        reference `dqvae_dual_entropy.py:258-261`). Returns (B, H, W, D)."""
        return self.quantize.get_codebook_entry(code)


class _VQModelBundle:
    """Config-level model: flax net + GAN loss module + train hyperparams."""

    feature_key = "h_dual"

    def __init__(
        self,
        encoderconfig,
        decoderconfig,
        lossconfig,
        vqconfig,
        quant_before_dim,
        quant_after_dim,
        quant_sample_temperature=0.0,
        ckpt_path=None,
        ignore_keys=(),
        image_key="image",
        monitor=None,
        warmup_epochs=0,
        loss_with_epoch=True,
        scheduler_type="linear-warmup_cosine-decay",
        entropy_patch_size=16,
        image_size=256,
        compute_dtype=None,
    ):
        self.net = DQVAENet(
            encoderconfig=encoderconfig,
            decoderconfig=decoderconfig,
            vqconfig=vqconfig,
            quant_before_dim=quant_before_dim,
            quant_after_dim=quant_after_dim,
            quant_sample_temperature=quant_sample_temperature,
            entropy_patch_size=entropy_patch_size,
            image_size=image_size,
            use_entropy=_is_entropy_router(encoderconfig),
            feature_key=self.feature_key,
            compute_dtype=compute_dtype,
        )
        self.loss = instantiate_from_config(lossconfig) if lossconfig else None
        self.image_key = image_key
        self.monitor = monitor
        self.warmup_epochs = warmup_epochs
        self.loss_with_epoch = loss_with_epoch
        self.scheduler_type = scheduler_type
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)
        self.image_size = image_size
        # set by the trainer (reference train.py:243-257)
        self.learning_rate = None
        self.min_learning_rate = 0.0
        self.steps_per_epoch = None
        self.training_steps = None

    # ---- functional API ----
    def init(self, rng, sample_batch=None):
        if sample_batch is None:
            sample_batch = jnp.zeros((1, self.image_size, self.image_size, 3), jnp.float32)
        return self.net.init(
            {"params": rng, "gumbel": jax.random.fold_in(rng, 1)}, sample_batch
        )

    def encode(self, variables, x, train=False, rngs=None, mutable=False):
        return self.net.apply(
            variables, x, train=train, method="encode", rngs=rngs, mutable=mutable
        )

    def decode(self, variables, quant, grain_indices=None):
        return self.net.apply(variables, quant, grain_indices, method="decode")

    def forward(self, variables, x, train=False, rngs=None, mutable=False):
        return self.net.apply(
            variables, x, train=train, rngs=rngs, mutable=mutable
        )

    def get_code_emb_with_depth(self, variables, code):
        return self.net.apply(variables, code, method="get_code_emb_with_depth")

    def log_images(self, variables, batch, **kwargs):
        """Reference `log_images` surface (`dqvae_dual_entropy.py:244-256`):
        inputs / reconstructions / grain_map (+ entropy_map when computed).
        Returns numpy arrays in [-1, 1]."""
        import numpy as np

        from ..utils import viz

        x = self.get_input(batch, self.image_key)
        xrec, _, grain_indices, gate, x_entropy = self.forward(variables, x)
        log = {
            "inputs": np.asarray(x),
            "reconstructions": np.asarray(xrec),
            "grain_map": viz.draw_grain_map_color(
                np.asarray(x), np.asarray(grain_indices)
            ),
        }
        if x_entropy is not None:
            e = np.asarray(x_entropy)
            e = (e - e.min()) / max(e.max() - e.min(), 1e-5)
            log["entropy_map"] = viz.draw_grain_map_color(np.asarray(x), e)
        return log

    @staticmethod
    def get_input(batch, key):
        """dict batch -> NHWC float image array (reference get_input, NCHW->NHWC)."""
        x = batch[key]
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 3:
            x = x[..., None]
        if x.shape[-1] not in (1, 3) and x.shape[1] in (1, 3):
            x = jnp.transpose(x, (0, 2, 3, 1))
        return x


class DualGrainVQModel(_VQModelBundle):
    """Dual-grain DQ-VAE (feature- or entropy-routed; the router target in
    ``encoderconfig`` decides — reference has `dqvae_dual_feat.py` /
    `dqvae_dual_entropy.py`)."""

    feature_key = "h_dual"


class TripleGrainVQModel(_VQModelBundle):
    """Triple-grain DQ-VAE (reference `dqvae_triple_feat.py`)."""

    feature_key = "h_triple"

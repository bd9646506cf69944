"""Legacy fixed-length stage-2 transformers over minGPT.

Reference: `models/stage2/uncond_transformer.py:16` (Net2NetTransformer-style
unconditional trainer) and `class_transformer.py:15` (class-conditional);
conditioners `SOSProvider` / `Labelator` from `utils/utils.py:151-215`.
Pipeline: frozen stage-1 encode -> flatten codes -> sequence permuter ->
[cond prefix ; codes] -> GPT with shifted CE; sampling uses the KV-cached
`sample_with_past` (the reference's `mingpt.py:324-355`).
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from ..utils.instantiate import instantiate_from_config


class SOSProvider:
    """Constant start-of-sequence token (reference utils/utils.py:205-215)."""

    def __init__(self, sos_token, quantize_interface=True):
        self.sos_token = sos_token

    def encode(self, x):
        b = x.shape[0]
        c = jnp.full((b, 1), self.sos_token, jnp.int32)
        return c, None, [None, None, c]


class Labelator:
    """class label + n_classes shift as conditioning token
    (reference utils/utils.py:151-170)."""

    def __init__(self, n_classes, quantize_interface=True, threshold=None):
        self.n_classes = n_classes
        self.threshold = threshold if threshold is not None else 0

    def encode(self, labels):
        c = jnp.asarray(labels, jnp.int32).reshape(-1, 1) + self.threshold
        return c, None, [None, None, c]


class UncondTransformer:
    """Fixed-length AR model over a frozen stage-1 codebook."""

    cond_is_class = False

    def __init__(
        self,
        transformer_config,
        first_stage_config,
        cond_stage_config=None,
        permuter_config=None,
        sos_token=0,
        downsample_cond_size=-1,
        pkeep=1.0,
        monitor=None,
        warmup_epochs=0,
        weight_decay=0.01,
        ckpt_path=None,
        ignore_keys=(),
        first_stage_key="image",
        cond_stage_key="image",
    ):
        self.transformer = instantiate_from_config(transformer_config)
        self.first_stage_model = instantiate_from_config(first_stage_config)
        if permuter_config is None:
            from .sequence_permuters import Identity

            self.permuter = Identity()
        else:
            self.permuter = instantiate_from_config(permuter_config)
        if cond_stage_config in (None, "__is_unconditional__"):
            self.cond_stage_model = SOSProvider(sos_token)
        else:
            self.cond_stage_model = instantiate_from_config(cond_stage_config)
        self.pkeep = pkeep
        self.monitor = monitor
        self.warmup_epochs = warmup_epochs
        self.weight_decay = weight_decay
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)
        self.first_stage_key = first_stage_key
        self.cond_stage_key = cond_stage_key
        self.learning_rate = None
        self.min_learning_rate = 0.0
        self.steps_per_epoch = None
        self.training_steps = None

    def init(self, rng, first_stage_variables):
        t = self.transformer
        dummy = jnp.zeros((1, min(t.block_size, 16)), jnp.int32)
        tvars = t.init({"params": rng, "dropout": rng}, dummy)
        return {"transformer": tvars, "first_stage": first_stage_variables}

    def encode_to_z(self, variables, x):
        quant, _, info, *_ = self.first_stage_model.encode(
            variables["first_stage"], x
        )
        codes = jax.lax.stop_gradient(info[2])
        b = codes.shape[0]
        flat = codes.reshape(b, -1)
        return quant, self.permuter(flat)

    def encode_to_c(self, c):
        _, _, (_, _, idx) = self.cond_stage_model.encode(c)
        return idx.reshape(idx.shape[0], -1)

    def forward(self, variables, x, c, train: bool = False, rngs=None):
        """logits + CE loss over the code sequence (cond prefix excluded from
        the targets), reference uncond_transformer.py shared_step."""
        _, z_indices = self.encode_to_z(variables, x)
        c_indices = self.encode_to_c(c)
        cz = jnp.concatenate([c_indices, z_indices], axis=1)
        inputs = cz[:, :-1]
        logits, _ = self.transformer.apply(
            variables["transformer"], inputs, train=train, rngs=rngs
        )
        # only predict the z part
        n_cond = c_indices.shape[1]
        logits_z = logits[:, n_cond - 1 :]
        from ..nn.stackgpt import cross_entropy_ignore

        loss = cross_entropy_ignore(logits_z, z_indices, ignore_index=-100)
        return logits_z, loss

    def sample(self, variables, c_indices, steps, rng, temperature=1.0,
               top_k=None, top_p=None, sample=True):
        from ..nn.mingpt import sample_with_past

        return sample_with_past(
            self.transformer, variables["transformer"], c_indices, steps, rng,
            temperature=temperature, top_k=top_k, top_p=top_p,
            sample_logits=sample,
        )

    def decode_to_img(self, variables, index, zshape):
        index = self.permuter(index, reverse=True)
        codes = index.reshape(zshape)
        quant = self.first_stage_model.get_code_emb_with_depth(
            variables["first_stage"], codes
        )
        return self.first_stage_model.decode(variables["first_stage"], quant)


class ClassTransformer(UncondTransformer):
    """Class-conditional variant (reference `models/stage2/class_transformer.py`)."""

    cond_is_class = True

    def __init__(self, *args, cond_stage_key="class_label", **kwargs):
        super().__init__(*args, cond_stage_key=cond_stage_key, **kwargs)

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
        kwargs = {}
        if getattr(t, "segment_size", 0) > 0:
            kwargs["segment"] = jnp.zeros_like(dummy)  # materialize seg_emb
        tvars = t.init({"params": rng, "dropout": rng}, dummy, **kwargs)
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


class Text2ImageTransformer(UncondTransformer):
    """Fixed-length text-to-image AR trainer (reference
    `models/stage2/text2image_transformer.py:15-356`): the condition is a
    pre-tokenized caption (int array under ``cond_stage_key``), image codes
    are shifted by ``text_vocab_size`` into a joint vocabulary, and the CE
    covers the image span (plus optionally the text span, weighted by
    ``text_loss_radio`` — reference spelling kept).

    ``use_segment=True`` gives the `text2image_transformer2.py` variant:
    a 0/1 text-vs-image segment embedding is fed to the (T2I-)GPT.
    """

    use_segment = False

    def __init__(
        self,
        transformer_config,
        first_stage_config,
        permuter_config=None,
        ckpt_path=None,
        ignore_keys=(),
        first_stage_key="image",
        cond_stage_key="caption",
        pkeep=1.0,
        monitor=None,
        weight_decay=0.01,
        warmup_epochs=0,
        text_loss_radio=0,
        text_vocab_size=0,
        image_vocab_size=0,
    ):
        super().__init__(
            transformer_config,
            first_stage_config,
            cond_stage_config=None,
            permuter_config=permuter_config,
            pkeep=pkeep,
            monitor=monitor,
            warmup_epochs=warmup_epochs,
            weight_decay=weight_decay,
            ckpt_path=ckpt_path,
            ignore_keys=ignore_keys,
            first_stage_key=first_stage_key,
            cond_stage_key=cond_stage_key,
        )
        self.text_loss_radio = text_loss_radio
        self.calculate_text_loss = text_loss_radio > 0
        self.image_loss_radio = 1 - text_loss_radio
        self.text_vocab_size = text_vocab_size
        self.image_vocab_size = image_vocab_size

    def encode_to_c(self, c):
        # captions arrive tokenized (reference feeds dataset caption tensors)
        return jnp.asarray(c, jnp.int32)

    def forward(self, variables, x, c, train: bool = False, rngs=None):
        """(total_loss, image_loss, text_loss) — reference `forward`
        (`text2image_transformer.py:168-215`)."""
        _, z_indices = self.encode_to_z(variables, x)
        z_indices = z_indices + self.text_vocab_size
        c_indices = self.encode_to_c(c)

        a_indices = z_indices
        if train and self.pkeep < 1.0 and rngs and "pkeep" in rngs:
            k1, k2 = jax.random.split(rngs["pkeep"])
            mask = jax.random.bernoulli(k1, self.pkeep, z_indices.shape)
            rand = jax.random.randint(
                k2, z_indices.shape, 0, self.transformer.vocab_size
            )
            a_indices = jnp.where(mask, z_indices, rand)

        cz = jnp.concatenate([c_indices, a_indices], axis=1)
        kwargs = {}
        if self.use_segment:
            b = cz.shape[0]
            seg = jnp.concatenate(
                [
                    jnp.zeros((b, c_indices.shape[1]), jnp.int32),
                    jnp.ones((b, a_indices.shape[1] - 1), jnp.int32),
                ],
                axis=1,
            )
            kwargs["segment"] = seg
        logits, _ = self.transformer.apply(
            variables["transformer"], cz[:, :-1], train=train, rngs=rngs,
            **kwargs,
        )
        from ..nn.stackgpt import cross_entropy_ignore

        n_cond = c_indices.shape[1]
        image_logits = logits[:, n_cond - 1 :]
        image_loss = cross_entropy_ignore(image_logits, z_indices, -100)
        if self.calculate_text_loss:
            text_logits = logits[:, : n_cond - 1]
            text_loss = cross_entropy_ignore(text_logits, c_indices[:, 1:], -100)
            total = (
                self.text_loss_radio * text_loss
                + self.image_loss_radio * image_loss
            )
            return total, image_loss, text_loss
        return image_loss, image_loss, jnp.zeros(())

    def sample(self, variables, c_indices, steps, rng, temperature=1.0,
               top_k=None, top_p=None, sample=True):
        from ..nn.mingpt import sample_with_past

        out = sample_with_past(
            self.transformer, variables["transformer"], c_indices, steps, rng,
            temperature=temperature, top_k=top_k, top_p=top_p,
            sample_logits=sample, use_segments=self.use_segment,
        )
        # back to image-code space
        return jnp.clip(out - self.text_vocab_size, 0, None)


class Text2ImageTransformer2(Text2ImageTransformer):
    """Segment-embedding t2i variant (reference
    `models/stage2/text2image_transformer2.py` — "增加了 segmentation
    embedding"); pair with a segment_size=2 GPT."""

    use_segment = True


class RQTransformerTrainer:
    """RQ-VAE stage 2 (reference `models/stage2/uncond_rqtransformer.py:18`):
    unconditional RQ-Transformer over a frozen RQ first stage. The reference
    trains a non-vendored external transformer through the interface
    ``transformer(idx, c_idx, model_aux, return_loss=True)`` /
    ``transformer.sample(...)``; `nn.rq_transformer.RQTransformer` implements
    that contract TPU-natively."""

    cond_is_class = False

    def __init__(
        self,
        transformer_config,
        first_stage_config,
        ckpt_path=None,
        ignore_keys=(),
        monitor=None,
        weight_decay=0.01,
        warmup_epochs=0,
    ):
        self.transformer = instantiate_from_config(transformer_config)
        self.first_stage_model = instantiate_from_config(first_stage_config)
        self.cond_stage_model = SOSProvider(0)
        self.first_stage_key = "image"
        self.cond_stage_key = "image"
        self.monitor = monitor
        self.weight_decay = weight_decay
        self.warmup_epochs = warmup_epochs
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)
        self.pkeep = 1.0
        self.learning_rate = None
        self.min_learning_rate = 0.0
        self.steps_per_epoch = None
        self.training_steps = None

    def init(self, rng, first_stage_variables):
        t = self.transformer
        dummy = jnp.zeros((1, 2, 2, t.depth), jnp.int32)
        tvars = t.init({"params": rng, "dropout": rng}, dummy,
                       jnp.zeros((1, t.cond_length), jnp.int32))
        return {"transformer": tvars, "first_stage": first_stage_variables}

    def encode_to_z(self, variables, x):
        _, _, info, *_ = self.first_stage_model.encode(variables["first_stage"], x)
        return jax.lax.stop_gradient(info[2])  # (B, H, W, D)

    def encode_to_c(self, c):
        _, _, (_, _, idx) = self.cond_stage_model.encode(c)
        return idx

    def forward(self, variables, x, c, train: bool = False, rngs=None):
        codes = self.encode_to_z(variables, x)
        c_idx = self.encode_to_c(c)
        loss = self.transformer.apply(
            variables["transformer"], codes, c_idx, return_loss=True,
            train=train, rngs=rngs,
        )
        return loss

    def decode_to_img(self, variables, codes):
        quant = self.first_stage_model.get_code_emb_with_depth(
            variables["first_stage"], codes
        )
        return self.first_stage_model.decode(variables["first_stage"], quant)

    def sample(self, variables, shape, c, rng, temperature=1.0, top_k=300,
               top_p=0.95):
        from ..nn.rq_transformer import sample_rq

        c_idx = self.encode_to_c(c) if c.ndim > 2 else jnp.asarray(c, jnp.int32)
        return sample_rq(
            self.transformer, variables["transformer"], shape, c_idx, rng,
            temperature=temperature, top_k=top_k, top_p=top_p,
        )

    def log_images(self, variables, batch, rng=None, temperature=1.0,
                   top_k=300, top_p=0.95, **kwargs):
        import numpy as np

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x = self.first_stage_model.get_input(batch, self.first_stage_key)[:4]
        codes = self.encode_to_z(variables, x)
        log = {
            "inputs": np.asarray(x),
            "reconstructions": np.asarray(self.decode_to_img(variables, codes)),
        }
        sampled = self.sample(variables, codes.shape, x, rng,
                              temperature=temperature, top_k=top_k, top_p=top_p)
        log["sample"] = np.asarray(self.decode_to_img(variables, sampled))
        return log

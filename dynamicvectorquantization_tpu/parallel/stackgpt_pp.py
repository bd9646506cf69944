"""Pipeline parallelism for the PRODUCT StackGPT training forward
(VERDICT r02 "missing" #2: pp reachable from the trainer CLI via
`train.py --pp N`).

The deep CONTENT stack (18 layers at the p6c18 geometry) pipelines over
the "pp" mesh axis via `parallel/pipeline.gpipe_apply` (shard_map +
ppermute GPipe schedule); everything else — embeddings, the 6-layer
position stack, the heads, the CE losses — is shallow and runs dense,
replicated over pp (sharded over dp when the mesh has one). Params stay
in the ordinary (unstacked) pytree the optimizer owns; the (S, L/S)
stacking is a pure jnp.stack inside jit, so XLA sees static layout.

Gradient flow through the ppermute ring is exact (its transpose is the
reverse permutation) — logit and grad equivalence vs the dense stack is
tested in tests/test_pipeline_parallel.py (library level) and
tests/test_trainer_parallel_axes.py (Stage2Trainer level).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from .pipeline import gpipe_apply, stack_layer_params


def stackgpt_train_losses_pp(model, variables_tf, mesh: Mesh, kwargs: dict,
                             microbatches: int = 2, pp_axis: str = "pp",
                             rngs=None):
    """Drop-in for `model.transformer.apply(variables_tf, **kwargs,
    rngs=rngs)` on the TRAINING (targets-present) path, pipelining the
    content stack over `pp_axis`.

    model: the DQTransformer owning a dense StackGPT (`model.transformer`).
    kwargs: the exact call kwargs `DQTransformer.forward_tokens` builds.
    microbatches: GPipe M (bubble fraction (S-1)/(M+S-1)); must divide the
    batch.
    """
    from ..nn.transformer import Block, TransformerStack

    sgpt = model.transformer
    train = bool(kwargs.get("train", False))
    params = variables_tf["params"]
    streams = {
        k: kwargs[k]
        for k in ("coarse_content", "fine_content", "coarse_position",
                  "fine_position", "coarse_seg", "fine_seg")
        if kwargs.get(k) is not None
    }

    # dense half: embeddings + position stack + shifted handoff
    x, shifted, attn_bias = sgpt.apply(
        variables_tf, **streams, train=train,
        method="embed_training_inputs", rngs=rngs,
    )
    if attn_bias is not None:
        raise ValueError("mask_pad_attention is not supported under pp")

    pos_key = None if rngs is None else rngs.get("dropout")
    pos_stack = TransformerStack(
        num_layers=sgpt.position_layer, n_embd=sgpt.n_embd,
        n_head=sgpt.n_head, attn_pdrop=sgpt.attn_pdrop,
        resid_pdrop=sgpt.resid_pdrop,
        use_flash_attention=sgpt.use_flash_attention,
    )
    pos_rngs = (
        None if pos_key is None
        # disjoint from the content blocks' (layer*4096 + tick) fold domain
        else {"dropout": jax.random.fold_in(pos_key, 2**31 - 1)}
    )
    position_hidden, _ = pos_stack.apply(
        {"params": params["position_transformer"]}, x,
        deterministic=not train, rngs=pos_rngs,
    )
    h = position_hidden + shifted

    # pipelined content stack
    b = h.shape[0]
    if b % microbatches:
        raise ValueError(
            f"batch {b} must divide pp microbatches ({microbatches})"
        )
    n_stages = mesh.shape[pp_axis]
    batch_axis = "dp" if "dp" in mesh.axis_names else None
    if batch_axis is not None and (b // microbatches) % mesh.shape["dp"]:
        raise ValueError(
            f"per-microbatch batch {b // microbatches} must divide the dp "
            f"axis ({mesh.shape['dp']}); raise the batch or lower "
            f"--pp_microbatches"
        )
    layer_list = [params["content_transformer"][f"h_{i}"]
                  for i in range(sgpt.content_layer)]
    stacked = stack_layer_params(layer_list, n_stages)
    xs = h.reshape(microbatches, b // microbatches, *h.shape[1:])

    block = Block(
        n_embd=sgpt.n_embd, n_head=sgpt.n_head, attn_pdrop=sgpt.attn_pdrop,
        resid_pdrop=sgpt.resid_pdrop,
        use_flash_attention=sgpt.use_flash_attention,
    )
    dropout_on = train and (sgpt.attn_pdrop > 0 or sgpt.resid_pdrop > 0)
    if dropout_on and pos_key is not None:
        block_fn = lambda p, xx, key: block.apply(
            {"params": p}, xx, deterministic=False,
            rngs={"dropout": key},
        )[0]
        rng = pos_key
    else:
        block_fn = lambda p, xx: block.apply(
            {"params": p}, xx, deterministic=not train
        )[0]
        rng = None
    out = gpipe_apply(block_fn, stacked, xs, mesh, axis=pp_axis,
                      batch_axis=batch_axis, rng=rng)
    content_hidden = out.reshape(h.shape)

    # dense heads (position head from the pre-pipeline hidden)
    def head(hid, ln_params, w):
        from ..nn.norm import FusedLayerNorm

        ln = FusedLayerNorm(epsilon=1e-5)
        hid = ln.apply({"params": ln_params}, hid)
        return hid @ w

    position_logits = head(
        position_hidden, params["position_head_ln"],
        params["position_head"]["kernel"],
    )
    content_logits = head(
        content_hidden, params["content_head_ln"],
        params["content_head"]["kernel"],
    )

    if kwargs.get("content_target") is None:
        return {"position_logits": position_logits,
                "content_logits": content_logits}
    return sgpt.losses_from_logits(
        position_logits, content_logits, kwargs["content_target"],
        kwargs["coarse_position_target"], kwargs["fine_position_target"],
        kwargs["coarse_position"].shape[1],
    )

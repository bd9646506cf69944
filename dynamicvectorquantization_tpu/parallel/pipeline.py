"""GPipe-style pipeline parallelism over a stack of identical blocks.

The reference has no pipeline story (DDP only, SURVEY.md §2.10); this is the
TPU-native "pp" axis for the deep stage-2 content stack (18 layers at
n_embd 1024): stages hold contiguous layer groups, microbatches stream
through a `shard_map` whose inter-stage hop is a `ppermute` over the "pp"
mesh axis — the canonical JAX pipelining recipe (activations ride ICI,
XLA overlaps the collective with the next tick's compute).

Differentiable end-to-end: `jax.grad` flows through the ppermute ring
(its transpose is the reverse permutation), so the same function serves
training. Bubble fraction is the usual (S-1)/(M+S-1).

Layout contract:
  * `stacked_params`: pytree whose leaves carry a leading (S, L_per_stage)
    axis pair — build it from a per-layer list with `stack_layer_params`.
  * `x`: (M, mb, ...) microbatches; returns (M, mb, ...) outputs
    (identical on every pp member, so downstream loss code is SPMD-clean).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layer_params(layer_params: list, n_stages: int):
    """[L x per-layer pytree] -> pytree with leading (S, L//S) axes."""
    n = len(layer_params)
    assert n % n_stages == 0, f"{n} layers not divisible by {n_stages} stages"
    per = n // n_stages

    def stack(*leaves):
        x = jnp.stack(leaves)  # (L, ...)
        return x.reshape(n_stages, per, *x.shape[1:])

    return jax.tree_util.tree_map(stack, *layer_params)


def gpipe_apply(block_fn, stacked_params, x, mesh: Mesh, axis: str = "pp",
                batch_axis: str | None = None, rng=None):
    """Run M microbatches through S pipeline stages.

    block_fn(params, x) -> x applies ONE block. Each stage scans its local
    layers; the classic M+S-1-tick schedule streams activations stage to
    stage via ppermute.

    batch_axis: mesh axis the microbatch dim (x's axis 1) is sharded over —
    composes pp with data parallelism on a (dp, pp) mesh.
    rng: optional PRNG key. When given, block_fn is called as
    block_fn(params, x, key) with a key folded per (tick, layer) — dropout
    inside the blocks draws a fresh mask per microbatch per layer, matching
    the dense stack's statistics.
    """
    n_stages = mesh.shape[axis]
    m = x.shape[0]

    p_spec = jax.tree_util.tree_map(
        lambda l: P(axis, *(None,) * (l.ndim - 1)), stacked_params
    )
    x_spec = P(None, batch_axis, *(None,) * (x.ndim - 2))

    def stage_fn(local_params, xs, *maybe_key):
        # local_params leaves: (1, L_per, ...) — this stage's layer group
        local_params = jax.tree_util.tree_map(lambda l: l[0], local_params)
        per = jax.tree_util.tree_leaves(local_params)[0].shape[0]
        stage = jax.lax.axis_index(axis)
        is_first = stage == 0
        is_last = stage == n_stages - 1

        def run_stage(h, t):
            def body(carry, inp):
                if maybe_key:
                    p, li = inp
                    # global layer id = stage*per + li; tick t is static
                    key = jax.random.fold_in(
                        maybe_key[0], (stage * per + li) * 4096 + t
                    )
                    return block_fn(p, carry, key), None
                return block_fn(inp, carry), None

            ins = (
                (local_params, jnp.arange(per)) if maybe_key else local_params
            )
            out, _ = jax.lax.scan(body, h, ins)
            return out

        zeros = jnp.zeros_like(xs[0])
        carry_in = zeros  # activation arriving from the previous stage
        outs = []
        for t in range(m + n_stages - 1):
            mb = xs[min(t, m - 1)] if t < m else jnp.zeros_like(xs[0])
            h_in = jnp.where(is_first, mb, carry_in)
            h_out = run_stage(h_in, t)
            # last stage emits microbatch t-(S-1) at tick t
            outs.append(h_out)
            # hop to the next stage (ring permute; the wraparound value is
            # masked out by the is_first select above)
            carry_in = jax.lax.ppermute(
                h_out, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
        # ticks S-1 .. M+S-2 hold the last stage's finished microbatches
        y_last = jnp.stack(outs[n_stages - 1:])  # (M, mb, ...)
        y_last = jnp.where(is_last, y_last, jnp.zeros_like(y_last))
        # broadcast the result to every pp member (psum of one-hot copies)
        return jax.lax.psum(y_last, axis)

    in_specs = (p_spec, x_spec) + (() if rng is None else (P(),))
    args = (stacked_params, x) + (() if rng is None else (rng,))
    try:
        from jax import shard_map  # jax >= 0.8 (check_vma kw)
        fn = shard_map(
            stage_fn, mesh=mesh, in_specs=in_specs, out_specs=x_spec,
            check_vma=False,
        )
    except (ImportError, TypeError):  # pragma: no cover
        from jax.experimental.shard_map import shard_map as shard_map_old

        fn = shard_map_old(
            stage_fn, mesh=mesh, in_specs=in_specs, out_specs=x_spec,
            check_rep=False,
        )
    return fn(*args)


def sequential_apply(block_fn, layer_params: list, x):
    """Ground truth: the same blocks applied back-to-back (no pipeline)."""
    for p in layer_params:
        x = block_fn(p, x)
    return x

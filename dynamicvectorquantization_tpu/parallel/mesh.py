"""Device mesh + sharding helpers.

The reference's only parallelism is data-parallel DDP with manual NCCL
collectives inside the EMA codebook (`SURVEY.md` §2.10;
`modules/vector_quantization/quantize2_mask.py:86-100`). The TPU-native
equivalent is one jitted SPMD program over a `jax.sharding.Mesh`:

  * batch sharded over the "dp" axis, parameters/EMA state replicated;
  * gradient sums, the EMA one-hot reductions, and the restart candidate
    pool become *global by construction* — XLA inserts psum/all-gather over
    ICI, replacing the reference's `dist.all_reduce` x2 + rank-0 broadcast;
  * restart randomness uses a replicated PRNG key, so every device computes
    identical restarts deterministically.

Multi-host pods: the same program with a mesh spanning hosts (DCN axis);
optimizer-state sharding (the reference's `ddp_sharded` analog) = adding a
"fsdp" axis to these specs.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "dp"):
    """Place a (global) batch pytree with the leading axis sharded over dp."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def make_mesh_multihost(n_hosts: int | None = None,
                        per_host: int | None = None) -> Mesh:
    """("dcn", "dp") mesh for multi-host pods (SURVEY.md §2.10's DCN axis).

    Outer axis spans hosts (data-center network), inner axis spans each
    host's chips (ICI). Shardings that matter for performance follow the
    topology: the batch shards over BOTH axes (pure data parallelism, so
    the only cross-host traffic is the gradient all-reduce, which XLA
    lowers hierarchically — reduce-scatter over ICI, then the small
    cross-host hop over DCN); optimizer-state sharding (ZeRO-1/FSDP)
    stays on the "dp" axis only, so its all-gathers ride ICI and never
    touch DCN.

    On a real pod: call `jax.distributed.initialize()` first (one process
    per host), then this builds the (process_count, local_device_count)
    mesh from the global device list. Single-process (tests, the driver's
    virtual-CPU dryrun) it reshapes local devices into the same named
    topology — the compiled SPMD program is identical, which is exactly
    what makes the dryrun a faithful rehearsal.
    """
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    devices = jax.devices()
    if per_host is None:
        per_host = len(devices) // n_hosts
    devices = np.asarray(devices[: n_hosts * per_host]).reshape(
        n_hosts, per_host
    )
    return Mesh(devices, ("dcn", "dp"))


def make_mesh_2d(n_dp: int, n_tp: int, axis2: str = "tp") -> Mesh:
    """(dp, <axis2>) mesh for the stage-2 model-parallel axes (tp default;
    "sp"/"pp" for `train.py --sp/--pp`). On real pods lay the model axis on
    the innermost (fastest-ICI) dimension; jax.devices() order already is
    torus-local on TPU."""
    devices = np.asarray(jax.devices()[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devices, ("dp", axis2))


def stage2_param_shardings(mesh: Mesh, params):
    """Megatron-style tensor-parallel shardings for the StackGPT/minGPT
    transformer param tree (nn/transformer.py names) — a scaling axis BEYOND
    the reference, whose only strategy is DDP (SURVEY.md §2.10).

    Column-split the attention q/k/v and mlp_fc kernels (output dim over
    "tp", biases likewise), row-split the proj / mlp_proj kernels (input dim
    over "tp", biases replicated); embeddings, layernorms and heads stay
    replicated. Under GSPMD that yields exactly one all-reduce after the
    attention proj and one after mlp_proj per block — XLA inserts them from
    the annotations; no manual collectives.
    """
    col = {"query", "key", "value", "mlp_fc"}
    row = {"proj", "mlp_proj"}

    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leafname = names[-1] if names else ""
        mod = names[-2] if len(names) > 1 else ""
        ndim = getattr(leaf, "ndim", 0)
        if mod in col:
            if leafname == "kernel" and ndim == 2 and leaf.shape[1] % mesh.shape["tp"] == 0:
                return NamedSharding(mesh, P(None, "tp"))
            if leafname == "bias" and ndim == 1 and leaf.shape[0] % mesh.shape["tp"] == 0:
                return NamedSharding(mesh, P("tp"))
        if mod in row and leafname == "kernel" and ndim == 2 \
                and leaf.shape[0] % mesh.shape["tp"] == 0:
            return NamedSharding(mesh, P("tp", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def opt_state_shardings(mesh: Mesh, opt_state, min_elements: int = 65536,
                        axis_name: str = "dp"):
    """ZeRO-1-style sharding spec for an optax state (the reference's
    `ddp_sharded` analog, `train.py:227-228`).

    Each large leaf (adam m/v moments — the bulk of training memory) gets its
    first `n_devices`-divisible axis sharded over dp; small leaves and
    non-divisible shapes stay replicated. Params remain replicated, so this
    trades an all-gather of the (lr-scaled) updates for 1/n of the optimizer
    memory — on TPU the gather rides ICI inside the one GSPMD program.
    """
    def spec(leaf):
        return zero1_leaf_spec(mesh, leaf, min_elements, axis_name)

    return jax.tree_util.tree_map(spec, opt_state)


def zero1_leaf_spec(mesh: Mesh, leaf, min_elements: int = 65536,
                    axis_name: str = "dp") -> NamedSharding:
    """The ZeRO-1 per-leaf rule: shard the first `axis size`-divisible axis of
    big leaves over `axis_name`; small/non-divisible leaves replicated."""
    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    shape = getattr(leaf, "shape", ())
    if int(np.prod(shape, dtype=np.int64)) < min_elements:
        return NamedSharding(mesh, P())
    for i, d in enumerate(shape):
        if d >= n and d % n == 0:
            parts = [None] * len(shape)
            parts[i] = axis_name
            return NamedSharding(mesh, P(*parts))
    return NamedSharding(mesh, P())


def tree_shardings_like(mesh: Mesh, tree, params, param_shardings,
                        fallback=None):
    """Sharding tree for an optimizer state that MATCHES its params' layout.

    Optax states embed param-shaped subtrees (adam mu/nu): every leaf of
    `tree` whose key-path ends with some param's key-path gets that param's
    sharding, so tp-sharded params keep their moments tp-sharded (no
    resharding traffic in the update). Non-matching leaves (step counters,
    ...) use `fallback(leaf)` when given (e.g. the ZeRO-1 rule to dp-shard
    moments of tp-replicated params) or replication.
    """
    from jax.tree_util import (
        keystr,
        tree_flatten_with_path,
        tree_structure,
        tree_unflatten,
    )

    p_flat = tree_flatten_with_path(params)[0]
    sh_leaves = jax.tree_util.tree_leaves(param_shardings)
    assert len(p_flat) == len(sh_leaves)
    pmap = {keystr(path): sh for (path, _), sh in zip(p_flat, sh_leaves)}
    repl = NamedSharding(mesh, P())
    out = []
    leaves = tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        ks = keystr(path)
        # longest matching suffix wins (shorter param paths can be proper
        # suffixes of deeper ones when module names repeat)
        best = None
        for pk, s in pmap.items():
            if ks.endswith(pk) and (best is None or len(pk) > len(best[0])):
                best = (pk, s)
        if best is not None:
            sh = best[1]
        else:
            sh = fallback(leaf) if fallback is not None else repl
        out.append(sh)
    return tree_unflatten(tree_structure(tree), out)


def fsdp_param_shardings(mesh: Mesh, params, min_elements: int = 65536,
                         axis_name: str = "dp"):
    """ZeRO-3 analog (one step beyond the reference's ddp_sharded): shard
    each large PARAM leaf over dp as well. Under GSPMD the forward/backward
    all-gather weights at use and reduce-scatter gradients — same math,
    1/n_dp of the param memory resident per device. Same leaf rules as
    `opt_state_shardings` (small/non-divisible leaves stay replicated)."""
    return opt_state_shardings(mesh, params, min_elements=min_elements,
                               axis_name=axis_name)

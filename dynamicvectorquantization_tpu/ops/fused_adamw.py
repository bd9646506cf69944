"""Fused AdamW update as a single-pass Pallas TPU kernel.

Motivation (VERDICT r02: "stage-2 train step is ~90% non-matmul"): the
profiled p6c18 device step spends ~54 ms of 191 ms in the optimizer — XLA
materializes the optax chain (scale_by_adam -> add_decayed_weights ->
scale_by_learning_rate -> apply_updates) as many HBM passes over the ~300M
f32 params + moments. The fused kernel does ONE read of (g, p, m, v) and ONE
aliased in-place write of (p, m, v) per element: ~28 B/param vs the chain's
multiple round trips.

Exact optax semantics (optax.adamw defaults, eps_root=0):

    m' = b1*m + (1-b1)*g            v' = b2*v + (1-b2)*g^2
    u  = (m'/(1-b1^t)) / (sqrt(v'/(1-b2^t)) + eps) + wd*p   (wd masked)
    p' = p - lr*u

`fused_adamw_apply` mirrors `tx.update + optax.apply_updates` for
`optax.adamw(schedule, b1, b2, weight_decay, mask)` — same state pytree
(chain of ScaleByAdamState / EmptyState / ScaleByScheduleState), so
checkpoints are interchangeable with the unfused path; equivalence is
asserted in tests/test_fused_adamw.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

# target elements per grid block: 7 planes (4 in + 3 aliased out) x 0.5 MB
# x2 for pipeline double-buffering must stay under the ~16 MB VMEM scope
_BLOCK_ELEMS = 1 << 17


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps", "wd",
                                              "interpret", "copy_dtype"))
def _fused_adamw_leaf(g, p, m, v, lr, c1, c2, *, b1, b2, eps, wd, interpret,
                      copy_dtype=None):
    """One parameter leaf: returns (p', m', v'), p/m/v aliased in-place —
    plus a `copy_dtype` (e.g. bf16) cast of p' written in the SAME pass when
    requested (the mixed-precision working copy; a separate cast pass costs
    a full extra HBM round trip over the params).

    lr/c1/c2: (1, 1) f32 scalars (lr, 1/(1-b1^t), 1/(1-b2^t))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = p.shape
    n = int(np.prod(shape, dtype=np.int64))
    if p.ndim >= 2:
        rows, cols = int(np.prod(shape[:-1], dtype=np.int64)), shape[-1]
    else:
        rows, cols = 1, n
    rb = max(1, min(rows, _BLOCK_ELEMS // max(cols, 1)))
    if rb < rows:
        # TPU lowering: a partial block's sublane dim must be divisible by 8
        # (full-array blocks are exempt)
        rb = max(8, rb - rb % 8)
    grid = (pl.cdiv(rows, rb),)

    def kernel(lr_ref, c1_ref, c2_ref, g_ref, p_ref, m_ref, v_ref,
               po_ref, mo_ref, vo_ref, *copy_refs):
        g_ = g_ref[...].astype(jnp.float32)
        m_ = b1 * m_ref[...] + (1.0 - b1) * g_
        v_ = b2 * v_ref[...] + (1.0 - b2) * (g_ * g_)
        u = (m_ * c1_ref[0, 0]) / (jnp.sqrt(v_ * c2_ref[0, 0]) + eps)
        p_ = p_ref[...]
        if wd:
            u = u + wd * p_
        pn = p_ - lr_ref[0, 0] * u
        po_ref[...] = pn
        mo_ref[...] = m_
        vo_ref[...] = v_
        if copy_refs:
            copy_refs[0][...] = pn.astype(copy_refs[0].dtype)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    plane = pl.BlockSpec((rb, cols), lambda i: (i, 0))
    f32 = jax.ShapeDtypeStruct((rows, cols), jnp.float32)
    out_specs = [plane, plane, plane]
    out_shape = [f32, f32, f32]
    if copy_dtype is not None:
        out_specs.append(plane)
        out_shape.append(jax.ShapeDtypeStruct((rows, cols),
                                              jnp.dtype(copy_dtype)))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, smem, smem, plane, plane, plane, plane],
        out_specs=out_specs,
        out_shape=out_shape,
        # p, m, v updated in place (inputs 4, 5, 6 -> outputs 0, 1, 2)
        input_output_aliases={4: 0, 5: 1, 6: 2},
        interpret=interpret,
    )(
        lr, c1, c2,
        g.reshape(rows, cols), p.reshape(rows, cols),
        m.reshape(rows, cols), v.reshape(rows, cols),
    )
    return tuple(o.reshape(shape) for o in out)


def fused_adamw_apply(grads, opt_state, params, schedule, b1=0.9, b2=0.95,
                      eps=1e-8, weight_decay=0.0, mask=None, interpret=None,
                      param_copy_dtype=None):
    """Drop-in for `updates, opt = tx.update(grads, opt, params);
    params = optax.apply_updates(params, updates)` with
    tx = optax.adamw(schedule, b1, b2, weight_decay=weight_decay, mask=mask).

    Returns (new_params, new_opt_state) with the SAME opt-state pytree as the
    optax chain. `mask`: optax-style pytree/callable of bools selecting the
    decayed leaves.

    `param_copy_dtype` (e.g. "bfloat16"): ALSO return a cast copy of the new
    params, written by the same kernel pass — return becomes
    (new_params, params_copy, new_opt_state). Grads may arrive in the compute
    dtype (bf16); the kernel upcasts them, which is value-identical to
    differentiating the in-loss cast (the VJP upcast preserves values)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    adam = opt_state[0]
    count = optax.safe_int32_increment(adam.count)
    tf = count.astype(jnp.float32)
    lr = jnp.asarray(schedule(adam.count) if callable(schedule) else schedule,
                     jnp.float32).reshape(1, 1)
    c1 = (1.0 / (1.0 - jnp.float32(b1) ** tf)).reshape(1, 1)
    c2 = (1.0 / (1.0 - jnp.float32(b2) ** tf)).reshape(1, 1)

    mask_tree = mask(params) if callable(mask) else mask

    leaves_p, treedef = jax.tree_util.tree_flatten(params)
    leaves_g = treedef.flatten_up_to(grads)
    leaves_m = treedef.flatten_up_to(adam.mu)
    leaves_v = treedef.flatten_up_to(adam.nu)
    leaves_mask = (
        treedef.flatten_up_to(mask_tree) if mask_tree is not None
        else [True] * len(leaves_p)
    )

    copy_dt = None if param_copy_dtype is None else str(
        jnp.dtype(param_copy_dtype))
    new_p, new_m, new_v, new_c = [], [], [], []
    for g, p, m, v, use_wd in zip(leaves_g, leaves_p, leaves_m, leaves_v,
                                  leaves_mask):
        wd = float(weight_decay) if (use_wd and weight_decay) else 0.0
        out = _fused_adamw_leaf(g, p, m, v, lr, c1, c2, b1=float(b1),
                                b2=float(b2), eps=float(eps), wd=wd,
                                interpret=bool(interpret),
                                copy_dtype=copy_dt)
        new_p.append(out[0])
        new_m.append(out[1])
        new_v.append(out[2])
        if copy_dt is not None:
            new_c.append(out[3])

    unflatten = treedef.unflatten
    new_adam = adam._replace(count=count, mu=unflatten(new_m),
                             nu=unflatten(new_v))
    rest = []
    for s in opt_state[1:]:
        # the chain's other stateful member is scale_by_learning_rate's
        # ScaleByScheduleState-style count; keep it in lockstep
        # NB tuple.count is a method — check _fields, not hasattr
        rest.append(
            s._replace(count=count)
            if "count" in getattr(s, "_fields", ()) else s
        )
    if copy_dt is not None:
        return unflatten(new_p), unflatten(new_c), (new_adam, *rest)
    return unflatten(new_p), (new_adam, *rest)

"""GPipe pipeline parallelism (parallel/pipeline.py): outputs AND gradients
through the S-stage ppermute schedule must match the sequential stack."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh

from dynamicvectorquantization_tpu.nn.transformer import Block
from dynamicvectorquantization_tpu.parallel.pipeline import (
    gpipe_apply,
    sequential_apply,
    stack_layer_params,
)

pytestmark = pytest.mark.slow  # full train-step compiles; quick tier: -m 'not slow'

N_LAYERS, STAGES, MICRO, MB, T, D = 4, 2, 4, 2, 8, 16


@pytest.fixture(scope="module")
def blocks_and_data():
    block = Block(n_embd=D, n_head=2)
    xs = jax.random.normal(jax.random.PRNGKey(0), (MICRO, MB, T, D))
    layer_params = [
        block.init(jax.random.PRNGKey(i), xs[0])["params"]
        for i in range(N_LAYERS)
    ]

    def block_fn(p, x):
        y = block.apply({"params": p}, x)
        return y[0] if isinstance(y, tuple) else y

    return block_fn, layer_params, xs


def _mesh():
    import numpy as onp

    return Mesh(onp.asarray(jax.devices()[:STAGES]), ("pp",))


def test_gpipe_matches_sequential(blocks_and_data):
    block_fn, layer_params, xs = blocks_and_data
    ref = jnp.stack([
        sequential_apply(block_fn, layer_params, xs[i]) for i in range(MICRO)
    ])
    mesh = _mesh()
    stacked = stack_layer_params(layer_params, STAGES)
    out = jax.jit(
        lambda p, x: gpipe_apply(block_fn, p, x, mesh)
    )(stacked, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_gpipe_gradients_match(blocks_and_data):
    block_fn, layer_params, xs = blocks_and_data
    mesh = _mesh()

    def loss_pp(stacked, x):
        y = gpipe_apply(block_fn, stacked, x, mesh)
        return jnp.mean(y ** 2)

    def loss_seq(params_list, x):
        y = jnp.stack([
            sequential_apply(block_fn, params_list, x[i]) for i in range(MICRO)
        ])
        return jnp.mean(y ** 2)

    stacked = stack_layer_params(layer_params, STAGES)
    g_pp = jax.jit(jax.grad(loss_pp))(stacked, xs)
    g_seq = jax.grad(loss_seq)(layer_params, xs)
    g_seq_stacked = stack_layer_params(g_seq, STAGES)
    for a, b in zip(jax.tree_util.tree_leaves(g_seq_stacked),
                    jax.tree_util.tree_leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-6)


# ---------------------------------------------------------------------------
# pp on the PRODUCT model (VERDICT r02 #5): GPipe over the ACTUAL StackGPT
# content-transformer blocks, fed by the real position->content hidden
# handoff; logits and content-block grads must match the dense forward.
# ---------------------------------------------------------------------------
def test_gpipe_on_stackgpt_content_stack():
    import flax.linen as nn

    from dynamicvectorquantization_tpu.nn.stackgpt import StackGPT
    from dynamicvectorquantization_tpu.nn.transformer import TransformerStack

    kw = dict(
        vocab_size=20, coarse_position_size=12, fine_position_size=20,
        segment_size=2, block_size=64, position_layer=2, content_layer=4,
        n_head=2, n_embd=D, embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
        content_pad_code=17, coarse_position_pad_code=9,
        fine_position_pad_code=17,
    )
    model = StackGPT(**kw)
    import numpy as onp

    g = onp.random.default_rng(5)
    b, lc, lf = 4, 5, 8
    streams = dict(
        coarse_content=jnp.asarray(g.integers(0, 16, (b, lc)), jnp.int32),
        fine_content=jnp.asarray(g.integers(0, 16, (b, lf)), jnp.int32),
        coarse_position=jnp.asarray(g.integers(0, 9, (b, lc)), jnp.int32),
        fine_position=jnp.asarray(g.integers(0, 16, (b, lf)), jnp.int32),
        coarse_seg=jnp.zeros((b, lc), jnp.int32),
        fine_seg=jnp.ones((b, lf), jnp.int32),
    )
    variables = model.init(jax.random.PRNGKey(0), **streams)
    ref = model.apply(variables, **streams)

    # real handoff: dense embeddings + position stack, then content input
    x, shifted, _ = model.apply(variables, **streams,
                                method="embed_training_inputs")
    pos_stack = TransformerStack(num_layers=2, n_embd=D, n_head=2)
    pos_hidden, _ = pos_stack.apply(
        {"params": variables["params"]["position_transformer"]}, x
    )
    h = pos_hidden + shifted

    block = Block(n_embd=D, n_head=2)
    block_fn = lambda p, xx: block.apply({"params": p}, xx)[0]
    content_params = [variables["params"]["content_transformer"][f"h_{i}"]
                      for i in range(4)]
    mesh = _mesh()
    micro = 2
    xs = h.reshape(micro, b // micro, *h.shape[1:])

    def content_logits_gpipe(layer_list):
        stacked = stack_layer_params(layer_list, STAGES)
        out = gpipe_apply(block_fn, stacked, xs, mesh)
        out = out.reshape(h.shape)
        ln = nn.LayerNorm(epsilon=1e-5)
        out = ln.apply(
            {"params": variables["params"]["content_head_ln"]}, out
        )
        return out @ variables["params"]["content_head"]["kernel"]

    logits = jax.jit(content_logits_gpipe)(content_params)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(ref["content_logits"]),
                               rtol=2e-5, atol=2e-5)

    # gradients w.r.t. the content block params agree with the dense model
    def dense_loss(layer_list):
        params = dict(variables["params"])
        params["content_transformer"] = {
            f"h_{i}": p for i, p in enumerate(layer_list)
        }
        o = model.apply({"params": params}, **streams)
        return jnp.mean(o["content_logits"] ** 2)

    def gpipe_loss(layer_list):
        return jnp.mean(content_logits_gpipe(layer_list) ** 2)

    g_ref = jax.grad(dense_loss)(content_params)
    g_pp = jax.jit(jax.grad(gpipe_loss))(content_params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)

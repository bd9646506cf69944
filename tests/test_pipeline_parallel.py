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

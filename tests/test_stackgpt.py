"""StackGPT tests: train-path losses + KV-cached decode == full forward."""
import jax
import jax.numpy as jnp
import numpy as np

from dynamicvectorquantization_tpu.nn.stackgpt import StackGPT, cross_entropy_ignore


def tiny_gpt(**kw):
    defaults = dict(
        vocab_size=20,
        coarse_position_size=12,
        fine_position_size=20,
        segment_size=2,
        block_size=64,
        position_layer=2,
        content_layer=2,
        n_head=2,
        n_embd=16,
        embd_pdrop=0.0,
        resid_pdrop=0.0,
        attn_pdrop=0.0,
        content_pad_code=17,
        coarse_position_pad_code=9,
        fine_position_pad_code=17,
    )
    defaults.update(kw)
    return StackGPT(**defaults)


def _streams(rng, b=2, lc=5, lf=6):
    ks = jax.random.split(rng, 6)
    return dict(
        coarse_content=jax.random.randint(ks[0], (b, lc), 0, 16),
        fine_content=jax.random.randint(ks[1], (b, lf), 0, 16),
        coarse_position=jax.random.randint(ks[2], (b, lc), 0, 9),
        fine_position=jax.random.randint(ks[3], (b, lf), 0, 16),
        coarse_seg=jnp.zeros((b, lc), jnp.int32),
        fine_seg=jnp.ones((b, lf), jnp.int32),
    )


def test_cross_entropy_ignore():
    logits = jnp.array([[[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]]])
    targets = jnp.array([[0, 2]])
    full = cross_entropy_ignore(logits, targets, ignore_index=99)
    only_first = cross_entropy_ignore(logits, jnp.array([[0, 99]]), ignore_index=99)
    lp = jax.nn.log_softmax(logits)
    np.testing.assert_allclose(float(only_first), float(-lp[0, 0, 0]), rtol=1e-6)
    np.testing.assert_allclose(
        float(full), float(-(lp[0, 0, 0] + lp[0, 1, 2]) / 2), rtol=1e-6
    )


def test_forward_losses_and_logit_shapes(rng):
    gpt = tiny_gpt()
    streams = _streams(jax.random.PRNGKey(1))
    variables = gpt.init({"params": rng}, **streams)

    logits = gpt.apply(variables, **streams)
    t = streams["coarse_position"].shape[1] + streams["fine_position"].shape[1] - 1
    assert logits["position_logits"].shape == (2, t, 20)
    assert logits["content_logits"].shape == (2, t, 20)

    content = jnp.concatenate([streams["coarse_content"], streams["fine_content"]], 1)
    out = gpt.apply(
        variables,
        **streams,
        content_target=content[:, 1:],
        coarse_position_target=streams["coarse_position"][:, 1:],
        fine_position_target=streams["fine_position"],
    )
    for k in ("position_loss", "content_loss", "coarse_position_loss", "fine_position_loss"):
        assert np.isfinite(float(out[k])), k
    np.testing.assert_allclose(
        float(out["position_loss"]),
        (float(out["coarse_position_loss"]) + float(out["fine_position_loss"])) / 2,
        rtol=1e-6,
    )


def test_pad_targets_ignored(rng):
    gpt = tiny_gpt()
    streams = _streams(jax.random.PRNGKey(1))
    variables = gpt.init({"params": rng}, **streams)
    content = jnp.concatenate([streams["coarse_content"], streams["fine_content"]], 1)
    tgt = content[:, 1:]
    out1 = gpt.apply(
        variables, **streams, content_target=tgt,
        coarse_position_target=streams["coarse_position"][:, 1:],
        fine_position_target=streams["fine_position"],
    )
    # replacing an arbitrary target with pad changes the content loss
    tgt_pad = tgt.at[:, 2].set(17)
    out2 = gpt.apply(
        variables, **streams, content_target=tgt_pad,
        coarse_position_target=streams["coarse_position"][:, 1:],
        fine_position_target=streams["fine_position"],
    )
    assert float(out1["content_loss"]) != float(out2["content_loss"])


def test_cached_steps_match_full_forward(rng):
    """The KV-cached position_step/content_step sequence must reproduce the
    training forward's logits exactly (the subtlest logic in the model —
    shifted position embeddings at the coarse->fine boundary)."""
    gpt = tiny_gpt()
    b, lc, lf = 2, 5, 6
    streams = _streams(jax.random.PRNGKey(1), b, lc, lf)
    variables = gpt.init({"params": rng}, **streams)

    full = gpt.apply(variables, **streams)
    t = lc + lf - 1

    pos_cache, content_cache = gpt.apply(variables, b, t, method="make_caches")
    content_all = jnp.concatenate([streams["coarse_content"], streams["fine_content"]], 1)

    pos_logits_steps, content_logits_steps = [], []
    for i in range(t):
        is_fine = i >= lc
        tok_c = content_all[:, i]
        tok_p = (
            streams["fine_position"][:, i - lc]
            if is_fine
            else streams["coarse_position"][:, i]
        )
        seg = jnp.full((b,), 1 if is_fine else 0, jnp.int32)
        x = gpt.apply(
            variables, tok_c, tok_p, seg, jnp.int32(i), is_fine,
            method="embed_input_token",
        )
        hidden, pos_logits, pos_cache = gpt.apply(
            variables, x, pos_cache, jnp.int32(i), method="position_step"
        )
        pos_logits_steps.append(pos_logits)

        next_is_fine = (i + 1) >= lc
        next_pos = (
            streams["fine_position"][:, i + 1 - lc]
            if next_is_fine
            else streams["coarse_position"][:, i + 1]
        )
        content_logits, content_cache = gpt.apply(
            variables, hidden, next_pos, next_is_fine, content_cache, jnp.int32(i),
            method="content_step",
        )
        content_logits_steps.append(content_logits)

    got_pos = np.stack([np.asarray(l) for l in pos_logits_steps], axis=1)
    got_content = np.stack([np.asarray(l) for l in content_logits_steps], axis=1)
    np.testing.assert_allclose(
        got_pos, np.asarray(full["position_logits"]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        got_content, np.asarray(full["content_logits"]), rtol=1e-4, atol=1e-4
    )


def test_chunked_decode_attention_matches_full(rng):
    """Cache capacity that is a _DECODE_CHUNK multiple routes single-token
    steps through the chunked online-softmax path; logits must match the full
    forward exactly (same tolerance as the dense-cache path)."""
    gpt = tiny_gpt()
    b, lc, lf = 2, 5, 6
    streams = _streams(jax.random.PRNGKey(1), b, lc, lf)
    variables = gpt.init({"params": rng}, **streams)
    full = gpt.apply(variables, **streams)
    t = lc + lf - 1

    # capacity 256 (chunk multiple) -> chunked path
    pos_cache, content_cache = gpt.apply(variables, b, 256, method="make_caches")
    assert pos_cache.layers[0][0].shape[2] == 256
    content_all = jnp.concatenate([streams["coarse_content"], streams["fine_content"]], 1)
    got_pos = []
    for i in range(t):
        is_fine = i >= lc
        tok_c = content_all[:, i]
        tok_p = (streams["fine_position"][:, i - lc] if is_fine
                 else streams["coarse_position"][:, i])
        seg = jnp.full((b,), 1 if is_fine else 0, jnp.int32)
        x = gpt.apply(variables, tok_c, tok_p, seg, jnp.int32(i), is_fine,
                      method="embed_input_token")
        hidden, pos_logits, pos_cache = gpt.apply(
            variables, x, pos_cache, jnp.int32(i), method="position_step")
        got_pos.append(pos_logits)
    got = np.stack([np.asarray(l) for l in got_pos], axis=1)
    np.testing.assert_allclose(
        got, np.asarray(full["position_logits"]), rtol=1e-4, atol=1e-4
    )

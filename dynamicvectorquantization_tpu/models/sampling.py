"""Vectorized sampling utilities: top-k / top-p filtering and categorical draw.

Reference: `models/stage2/utils.py:22-40` (`top_k_logits` keeps the k largest
logits; `top_p_logits` operates on *probabilities* — sort desc, cumsum >= p
removal shifted right by one, renormalize).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def top_k_logits(logits, k: int):
    if k is None:
        return logits
    k = min(int(k), logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def top_p_probs(probs, p: float):
    """Nucleus filtering on probabilities, reference semantics."""
    if p is None or p >= 1.0:
        return probs / jnp.sum(probs, axis=-1, keepdims=True)
    sort_idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    remove = cum >= p
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
    )
    # scatter back to vocabulary order
    inv = jnp.argsort(sort_idx, axis=-1)
    remove_vocab = jnp.take_along_axis(remove, inv, axis=-1)
    filtered = jnp.where(remove_vocab, 0.0, probs)
    return filtered / jnp.sum(filtered, axis=-1, keepdims=True)


def sample_from_logits(
    rng,
    logits,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
    sample: bool = True,
):
    """temperature -> (ban masks applied by caller) -> top_k -> softmax ->
    top_p renormalize -> categorical / argmax. Returns (B,) int32."""
    logits = logits.astype(jnp.float32) / temperature
    logits = top_k_logits(logits, top_k)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = top_p_probs(probs, top_p)
    if sample:
        return jax.random.categorical(rng, jnp.log(probs + 1e-20), axis=-1)
    return jnp.argmax(probs, axis=-1)

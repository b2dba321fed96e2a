"""Logit filtering for sampling: truncation (top-r), top-k, temperature.

TPU-native replacements for the reference's sticky monkey-patches
(``dalle_spec.py:135-177`` wraps ``predict_start`` permanently per process).
Here filtering is an explicit pure function applied inside the jitted sampler
step, selected by static config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .diffusion import MIN_LOGP

__all__ = ["truncate_top_r", "truncate_top_k", "apply_temperature", "top_k_multinomial"]


def truncate_top_r(log_probs: jnp.ndarray, r: float) -> jnp.ndarray:
    """Nucleus-style truncation over the class axis (last).

    Sort descending, keep the largest prefix whose cumulative probability stays
    below ``r`` (the top class is always kept), set the rest to -70 — the
    ``top0.85r`` rule of ``predict_start_with_truncation`` (dalle_spec.py:158-174).
    No renormalization (matches reference; the posterior renormalizes).
    """
    sorted_lp = jnp.sort(log_probs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jnp.exp(sorted_lp), axis=-1)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], dtype=bool), cum[..., :-1] < r], axis=-1
    )
    # Threshold trick: a class is kept iff its log-prob >= the smallest kept
    # sorted value. Ties share identical log-probs so the boundary is exact.
    kept_vals = jnp.where(keep_sorted, sorted_lp, jnp.inf)
    threshold = jnp.min(kept_vals, axis=-1, keepdims=True)
    keep = log_probs >= threshold
    return jnp.where(keep, log_probs, MIN_LOGP)


def truncate_top_k(log_probs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k largest classes per position, set the rest to -70
    (the ``top<k>p`` rule, dalle_spec.py:147-157)."""
    kth = jnp.sort(log_probs, axis=-1)[..., -k][..., None]
    return jnp.where(log_probs >= kth, log_probs, MIN_LOGP)


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    return logits if temperature == 1.0 else logits / temperature


def top_k_multinomial(key: jax.Array, logits: jnp.ndarray, k: int, temperature: float = 1.0) -> jnp.ndarray:
    """Top-k multinomial sampling over the last axis (AR baseline sampler,
    ``Codebook/evaluation/generate_samples_caps.py:192-229``)."""
    logits = apply_temperature(logits, temperature)
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    masked = jnp.where(logits >= kth, logits, -jnp.inf)
    return jax.random.categorical(key, masked, axis=-1)

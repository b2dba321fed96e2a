"""Truncation / top-k filtering tests (the top0.85r rule of dalle_spec.py:158-174)."""

import numpy as np

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.ops import sampling as S
from text_to_sound_synthesis_tpu.ops.diffusion import MIN_LOGP


def test_truncate_top_r_keeps_prefix():
    # probs: [0.5, 0.3, 0.15, 0.05] with r=0.85 -> cumulative 0.5, 0.8, 0.95
    # shifted-keep rule: class kept iff cumprob *before* it is < r
    # -> keep 0.5 (always), 0.3 (0.5<0.85), 0.15 (0.8<0.85); drop 0.05 (0.95>=r)
    p = np.array([0.5, 0.3, 0.15, 0.05])
    lp = jnp.asarray(np.log(p)[None, None, :].astype(np.float32))
    out = np.asarray(S.truncate_top_r(lp, 0.85))[0, 0]
    np.testing.assert_allclose(out[:3], np.log(p[:3]), atol=1e-6)
    assert out[3] == MIN_LOGP


def test_truncate_top_r_always_keeps_top():
    p = np.array([0.99, 0.01])
    lp = jnp.asarray(np.log(p)[None, None, :].astype(np.float32))
    out = np.asarray(S.truncate_top_r(lp, 0.5))[0, 0]  # r smaller than top prob
    np.testing.assert_allclose(out[0], np.log(0.99), atol=1e-6)
    assert out[1] == MIN_LOGP


def test_truncate_top_r_unsorted_positions(rng):
    lp = np.log(rng.dirichlet(np.ones(10), size=(2, 3)).astype(np.float32))
    out = np.asarray(S.truncate_top_r(jnp.asarray(lp), 0.85))
    for b in range(2):
        for l in range(3):
            order = np.argsort(lp[b, l])[::-1]
            cum = np.cumsum(np.exp(lp[b, l][order]))
            keep_sorted = np.concatenate([[True], cum[:-1] < 0.85])
            kept = set(order[keep_sorted])
            for k in range(10):
                if k in kept:
                    assert out[b, l, k] == lp[b, l, k]
                else:
                    assert out[b, l, k] == MIN_LOGP


def test_truncate_top_k():
    lp = jnp.asarray(np.log(np.array([[[0.4, 0.3, 0.2, 0.1]]], dtype=np.float32)))
    out = np.asarray(S.truncate_top_k(lp, 2))[0, 0]
    assert (out[:2] > MIN_LOGP).all()
    assert (out[2:] == MIN_LOGP).all()


def test_top_k_multinomial_restricts_support():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.log([[0.05, 0.5, 0.05, 0.4]]) .astype(np.float32))
    logits = jnp.tile(logits, (2000, 1))
    samples = np.asarray(S.top_k_multinomial(key, logits, k=2))
    assert set(np.unique(samples)) <= {1, 3}
    freq = (samples == 1).mean()
    np.testing.assert_allclose(freq, 0.5 / 0.9, atol=0.05)

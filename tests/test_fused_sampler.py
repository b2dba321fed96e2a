"""Fused sampler-step tests: index-based math == one-hot composition; the
Pallas kernel (interpret mode) == the jnp reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from text_to_sound_synthesis_tpu.ops import diffusion as dd
from text_to_sound_synthesis_tpu.ops import fused_sampler as fs
from text_to_sound_synthesis_tpu.ops.sampling import truncate_top_r

T, K, B, L = 10, 7, 2, 5


@pytest.fixture(scope="module")
def setup(rng=None):
    rng = np.random.default_rng(0)
    sched = dd.make_schedule(T, K)
    logits = jnp.asarray(rng.standard_normal((B, L, K - 1)).astype(np.float32) * 2)
    xt = jnp.asarray(rng.integers(0, K, (B, L)), jnp.int32)
    return sched, logits, xt


def _onehot_path(sched, logits, xt, t_post, trunc_r=0.0):
    """The existing composition: one-hot log_z + predict_start semantics."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp = jnp.concatenate([lp, jnp.full(lp.shape[:-1] + (1,), dd.MIN_LOGP)], axis=-1)
    lp = jnp.clip(lp, dd.MIN_LOGP, 0.0)
    if trunc_r:
        lp = truncate_top_r(lp, trunc_r)
    log_z = dd.index_to_log_onehot(xt, K)
    tvec = jnp.full((B,), t_post, jnp.int32)
    return dd.q_posterior(sched, lp, log_z, tvec)


@pytest.mark.parametrize("t_post", [0, 4, T - 1])
def test_index_math_matches_onehot_composition(setup, t_post):
    sched, logits, xt = setup
    coeffs = fs.step_coeffs(sched, jnp.asarray(t_post))
    _, got = fs.p_sample_from_indices(logits, xt, coeffs, jax.random.PRNGKey(0),
                                      return_log_probs=True)
    want = _onehot_path(sched, logits, xt, t_post)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bisect_truncation_close_to_sort(setup):
    sched, logits, xt = setup
    lp = jax.nn.log_softmax(logits, axis=-1)
    lp = jnp.concatenate([lp, jnp.full(lp.shape[:-1] + (1,), dd.MIN_LOGP)], axis=-1)
    a = np.asarray(truncate_top_r(lp, 0.85))
    b = np.asarray(fs._truncate_rows(lp, 0.85))
    # identical except possible one-class boundary ties
    kept_a = (a > dd.MIN_LOGP).sum(-1)
    kept_b = (b > dd.MIN_LOGP).sum(-1)
    assert np.abs(kept_a - kept_b).max() <= 1
    both = (a > dd.MIN_LOGP) & (b > dd.MIN_LOGP)
    np.testing.assert_allclose(a[both], b[both])


def test_pallas_kernel_matches_jnp_reference(setup):
    sched, logits, xt = setup
    coeffs = fs.step_coeffs(sched, jnp.asarray(3))
    _, want = fs.p_sample_from_indices(logits, xt, coeffs, jax.random.PRNGKey(0),
                                       truncation_r=0.85, return_log_probs=True)
    with pltpu.force_tpu_interpret_mode():
        tokens, got = fs.fused_p_sample(logits, xt, coeffs, jnp.asarray(7, jnp.int32),
                                        truncation_r=0.85, row_block=8,
                                        return_log_probs=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    arr = np.asarray(tokens)
    assert arr.shape == (B, L)
    assert ((arr >= 0) & (arr < K)).all()


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="interpret-mode PRNG emits constant bits; "
                           "validated on real TPU (maxdev 0.019/500 draws)")
def test_pallas_kernel_sampling_distribution(setup):
    """Kernel PRNG sampling follows the posterior distribution."""
    sched, logits, xt = setup
    coeffs = fs.step_coeffs(sched, jnp.asarray(5))
    _, lp = fs.p_sample_from_indices(logits, xt, coeffs, jax.random.PRNGKey(0),
                                     return_log_probs=True)
    want_p = np.exp(np.asarray(lp))[0, 0]
    want_p = want_p / want_p.sum()
    counts = np.zeros(K)
    n = 400
    with pltpu.force_tpu_interpret_mode():
        for s in range(n):
            toks = fs.fused_p_sample(logits, xt, coeffs, jnp.asarray(s, jnp.int32),
                                     row_block=8)
            counts[int(np.asarray(toks)[0, 0])] += 1
    freq = counts / n
    np.testing.assert_allclose(freq, want_p, atol=0.12)


def test_sample_tokens_fused_jnp_fallback(rng):
    """The index-carrying sampler (jnp fallback path) runs end to end."""
    from tests.test_diffusion_model import SMALL
    from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
    from text_to_sound_synthesis_tpu.models.diffusion.process import sample_tokens_fused

    model = DiscreteDiffusion(transformer_config={"params": SMALL}, diffusion_step=8)
    tokens0 = jnp.zeros((2, 12), jnp.int32)
    cond = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), tokens0, cond, jnp.zeros((2,), jnp.int32))
    out = sample_tokens_fused(model, params, jax.random.PRNGKey(1), cond,
                              truncation_r=0.85, use_kernel=False)
    assert out.shape == (2, 12)
    arr = np.asarray(out)
    assert ((arr >= 0) & (arr < 11)).all()
    fast = sample_tokens_fused(model, params, jax.random.PRNGKey(1), cond,
                               truncation_r=0.85, skip_step=2, use_kernel=False)
    assert fast.shape == (2, 12)


def test_sampler_deterministic_given_key(rng):
    """Same key + params -> bit-identical samples (reproducibility guarantee
    the reference never had: its sampler consumes global torch RNG state)."""
    from tests.test_diffusion_model import SMALL
    from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
    from text_to_sound_synthesis_tpu.models.diffusion.process import sample_tokens_fused

    model = DiscreteDiffusion(transformer_config={"params": SMALL}, diffusion_step=8)
    cond = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 12), jnp.int32),
                        cond, jnp.zeros((2,), jnp.int32))
    a = sample_tokens_fused(model, params, jax.random.PRNGKey(7), cond,
                            truncation_r=0.85, use_kernel=False)
    b = sample_tokens_fused(model, params, jax.random.PRNGKey(7), cond,
                            truncation_r=0.85, use_kernel=False)
    c = sample_tokens_fused(model, params, jax.random.PRNGKey(8), cond,
                            truncation_r=0.85, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_fused_head_sample_matches_reference(setup, rng):
    """LN+head+sampler kernel (interpret) == the jnp oracle's posterior."""
    sched, _, xt = setup
    D = 32
    M = B * L
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32)).astype(jnp.bfloat16)
    norm = jnp.asarray(np.stack([rng.random(D) + 0.5, rng.standard_normal(D) * 0.1]),
                       jnp.float32)
    hw = jnp.asarray(rng.standard_normal((D, K - 1)) * 0.2, jnp.bfloat16)
    hb = jnp.asarray(rng.standard_normal(K - 1) * 0.1, jnp.float32)
    coeffs = fs.step_coeffs(sched, jnp.asarray(3))
    xt_flat = xt.reshape(M, 1)

    _, want = fs.head_sample_reference(x, xt_flat[:, 0], norm, hw, hb, coeffs,
                                       jax.random.PRNGKey(0), truncation_r=0.85)
    with pltpu.force_tpu_interpret_mode():
        tokens, got = fs.fused_head_sample(
            x, xt_flat, norm, hw, hb, coeffs, jnp.asarray(7, jnp.int32),
            truncation_r=0.85, row_block=5, return_log_probs=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)
    arr = np.asarray(tokens)
    assert arr.shape == (M,)
    assert ((arr >= 0) & (arr < K)).all()

"""Static (calibrated) activation scales for the int8 serving engine.

Covers the three tiers: kernel-vs-oracle exactness with static scales
(interpret mode), the calibration pass itself (scale extraction on a tiny
engine), and the calibrated engine end-to-end (logit accuracy vs the
dynamic-quant engine and sampled-token distribution agreement)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
from text_to_sound_synthesis_tpu.models.diffusion.calibrate import (
    N_SITES,
    calibrate_act_scales,
)
from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
    int8_backbone_logits,
    precompute_cond_kvs,
    quantize_denoiser,
    sample_tokens_int8,
)
from text_to_sound_synthesis_tpu.ops import int8_block as IB
from text_to_sound_synthesis_tpu.ops.quant import quantize_weight

# ---------------------------------------------------------------------------
# kernel vs oracle, static scales (interpret mode)
# ---------------------------------------------------------------------------

B, Lp, D, H = 2, 32, 128, 4
M = B * Lp


def _qw(key, K, N, s=0.05):
    return quantize_weight(
        jax.random.normal(jax.random.PRNGKey(key), (K, N), jnp.float32) * s,
        jax.random.normal(jax.random.PRNGKey(key + 100), (N,), jnp.float32) * 0.05,
    )


@pytest.fixture(scope="module")
def data():
    x = jax.random.normal(jax.random.PRNGKey(0), (M, D), jnp.bfloat16)
    mod = jnp.stack([jax.random.normal(jax.random.PRNGKey(1), (D,)) * 0.2,
                     jax.random.normal(jax.random.PRNGKey(2), (D,)) * 0.2])
    return x, mod


def test_self_attn_block_static(data):
    x, mod = data
    ws = [_qw(i, D, D) for i in (3, 4, 5, 6)]
    ss = (0.05, 0.02)
    got = IB.self_attn_block(x, mod, *ws, batch=B, n_head=H, q_valid=Lp - 3,
                             interpret=True, static_s=ss)
    want = IB.self_attn_block_reference(x, mod, *ws, batch=B, n_head=H,
                                        q_valid=Lp - 3, static_s=ss)
    g = np.asarray(got, np.float32).reshape(B, Lp, D)[:, :Lp - 3]
    w = np.asarray(want, np.float32).reshape(B, Lp, D)[:, :Lp - 3]
    np.testing.assert_allclose(g, w, rtol=2e-2, atol=2e-2)
    # static and dynamic must genuinely differ (different quant grids)
    dyn = IB.self_attn_block_reference(x, mod, *ws, batch=B, n_head=H,
                                       q_valid=Lp - 3)
    assert np.abs(np.asarray(want, np.float32)
                  - np.asarray(dyn, np.float32)).max() > 0


def test_mlp_block_static(data):
    x, mod = data
    w1, w2 = _qw(7, D, 4 * D), _qw(8, 4 * D, D)
    ss = (0.05, 0.03)
    got = IB.mlp_block(x, mod, w1, w2, block_m=32, interpret=True, static_s=ss)
    want = IB.mlp_block_reference(x, mod, w1, w2, static_s=ss)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_cross_attn_block_static(data):
    x, mod = data
    Skv = 16
    ck = jax.random.normal(jax.random.PRNGKey(9), (B * Skv, D), jnp.bfloat16)
    cv = jax.random.normal(jax.random.PRNGKey(10), (B * Skv, D), jnp.bfloat16)
    wq, wp = _qw(11, D, D), _qw(12, D, D)
    ss = (0.05, 0.02)
    got = IB.cross_attn_block(x, mod, ck, cv, wq, wp, batch=B, n_head=H,
                              kv_valid=Skv - 2, interpret=True, static_s=ss)
    want = IB.cross_attn_block_reference(x, mod, ck, cv, wq, wp, batch=B,
                                         n_head=H, kv_valid=Skv - 2,
                                         static_s=ss)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_static_saturates_beyond_scale():
    """Values beyond 127*s must clip, not wrap — the saturation contract."""
    from text_to_sound_synthesis_tpu.ops.quant import _quantize_static

    h = jnp.array([[300.0, -300.0, 1.0]])
    q, s = _quantize_static(h, 0.1)
    np.testing.assert_array_equal(np.asarray(q), [[127, -127, 10]])
    assert s == 0.1


# ---------------------------------------------------------------------------
# calibration + calibrated engine, tiny flagship-shaped model (CPU, xla impl)
# ---------------------------------------------------------------------------

T = 10
L = 15
NUM_EMBED = 16
COND_DIM = 64
S = 7


@pytest.fixture(scope="module")
def engine():
    model = DiscreteDiffusion(
        transformer_config={"params": dict(
            n_layer=2, n_embd=D, n_head=H, content_seq_len=L,
            condition_dim=COND_DIM, content_spatial_size=(3, 5),
            block_activate="GELU2",
        )},
        content_emb_config={"params": dict(num_embed=NUM_EMBED, embed_dim=D,
                                           spatial_size=(3, 5))},
        diffusion_step=T,
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, L), 0, NUM_EMBED + 1)
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, S, COND_DIM))
    params = model.init(key, tokens, cond, jnp.zeros((2,), jnp.int32))
    qp = quantize_denoiser(params, n_head=H, seq_len=L, num_timesteps=T)
    sched = model.schedule()
    scales = calibrate_act_scales(qp, sched, jax.random.PRNGKey(3), cond,
                                  truncation_r=0.85)
    return model, params, qp, qp.replace(act_scales=scales), cond, sched, scales


def test_calibration_scale_structure(engine):
    *_, scales = engine
    assert len(scales) == 2               # n_layer
    for row in scales:
        assert len(row) == N_SITES
        for s in row:
            assert isinstance(s, float) and 0 < s < 1e3


def test_static_logits_track_dynamic(engine):
    model, params, qp, qp_s, cond, sched, _ = engine
    tokens = jax.random.randint(jax.random.PRNGKey(4), (2, L), 0, NUM_EMBED)
    kvs = precompute_cond_kvs(qp, cond)
    dyn = np.asarray(int8_backbone_logits(qp, tokens, jnp.int32(3), kvs),
                     np.float64)
    sta = np.asarray(int8_backbone_logits(qp_s, tokens, jnp.int32(3), kvs),
                     np.float64)
    rel = np.abs(sta - dyn).mean() / (np.abs(dyn).mean() + 1e-9)
    corr = np.corrcoef(sta.ravel(), dyn.ravel())[0, 1]
    assert rel < 0.05, rel
    assert corr > 0.999, corr
    # and the static path genuinely ran a different quant grid
    assert np.abs(sta - dyn).max() > 0


def test_static_sampler_distribution(engine):
    """Marginal token histograms of the calibrated-static sampler vs the
    dynamic int8 sampler (same seeds): total-variation bounded."""
    model, params, qp, qp_s, cond, sched, _ = engine
    n_rep = 12
    cond_rep = jnp.tile(cond, (n_rep, 1, 1))
    t_dyn = sample_tokens_int8(qp, sched, jax.random.PRNGKey(7), cond_rep,
                               truncation_r=0.85)
    t_sta = sample_tokens_int8(qp_s, sched, jax.random.PRNGKey(7), cond_rep,
                               truncation_r=0.85)
    a = np.asarray(t_sta)
    assert a.shape == (2 * n_rep, L)
    assert (a >= 0).all() and (a < NUM_EMBED).all()  # MASK gone at t=0
    h_d = np.bincount(np.asarray(t_dyn).ravel(), minlength=NUM_EMBED + 1)
    h_s = np.bincount(a.ravel(), minlength=NUM_EMBED + 1)
    p = h_d / h_d.sum()
    q = h_s / h_s.sum()
    tv = 0.5 * np.abs(p - q).sum()
    assert tv < 0.08, tv


def test_calibrate_via_diffsound_api():
    """Diffsound.calibrate_serving_engine wires CLIP cond -> calibration ->
    a servable static engine."""
    from tests.test_composite import TINY_MODEL_CFG, _has_bpe
    from text_to_sound_synthesis_tpu.models.diffsound import build_model

    if not _has_bpe():
        pytest.skip("BPE artifact unavailable")
    model = build_model(TINY_MODEL_CFG)
    params = model.init_params(jax.random.PRNGKey(0), mel_shape=(1, 4, 16, 1))
    toks = jnp.asarray(model.text_to_tokens(["water drips"])["token"][:, :12])
    qp = model.quantize_for_serving(params)
    qp_s = model.calibrate_serving_engine(params, qp, jax.random.PRNGKey(0),
                                          toks, sample_type="top0.85r")
    assert qp_s.act_scales is not None
    mel = model.generate_int8(params, qp_s, jax.random.PRNGKey(1), toks)
    assert np.isfinite(np.asarray(mel)).all()

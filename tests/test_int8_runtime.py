"""Int8 serving runtime vs the f32/bf16 denoiser: logits accuracy + sampler.

With no released checkpoints in this environment, the gate is: (1) the int8
forward tracks the full-precision forward on random weights (relative error +
correlation), (2) the int8 sampler produces valid tokens deterministically.
Kernel-vs-oracle exactness is covered in tests/test_quant.py; these tests run
the default XLA int8 path (CPU suite; the Pallas sampler step is TPU-gated)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
    int8_backbone_logits,
    precompute_cond_kvs,
    quantize_denoiser,
    sample_tokens_int8,
)

T = 10
L = 15
NUM_EMBED = 16
D = 128
HEADS = 4
COND_DIM = 64
S = 7


@pytest.fixture(scope="module")
def setup():
    model = DiscreteDiffusion(
        transformer_config={"params": dict(
            n_layer=2, n_embd=D, n_head=HEADS, content_seq_len=L,
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
    qp = quantize_denoiser(params, n_head=HEADS, seq_len=L, num_timesteps=T)
    return model, params, qp, tokens, cond


def test_logits_match_fp_path(setup):
    model, params, qp, tokens, cond = setup
    tvec = jnp.full((2,), 3, jnp.int32)
    want = model.apply(params, tokens, cond, tvec, method=model.backbone_logits)
    kvs = precompute_cond_kvs(qp, cond)
    got = int8_backbone_logits(qp, tokens, jnp.int32(3), kvs)

    w = np.asarray(want, np.float64).ravel()
    g = np.asarray(got, np.float64).ravel()
    rel = np.linalg.norm(g - w) / (np.linalg.norm(w) + 1e-9)
    corr = np.corrcoef(w, g)[0, 1]
    # measured on this engine: rel ~0.017, corr ~0.99985 (r3). Thresholds
    # pinned at ~2x the measured drift so a kernel regression that doubles
    # the error FAILS (VERDICT r2 #3), with headroom for backend jitter.
    assert rel < 0.035, rel
    assert corr > 0.9995, corr


def test_logits_every_timestep_finite(setup):
    model, params, qp, tokens, cond = setup
    kvs = precompute_cond_kvs(qp, cond)
    for t in (0, T // 2, T - 1):
        out = int8_backbone_logits(qp, tokens, jnp.int32(t), kvs)
        assert out.shape == (2, L, NUM_EMBED)
        assert np.isfinite(np.asarray(out, np.float32)).all()


def test_sampler_runs_and_is_deterministic(setup):
    model, params, qp, _, cond = setup
    sched = model.schedule()
    toks1 = sample_tokens_int8(qp, sched, jax.random.PRNGKey(5), cond,
                               truncation_r=0.85)
    toks2 = sample_tokens_int8(qp, sched, jax.random.PRNGKey(5), cond,
                               truncation_r=0.85)
    a = np.asarray(toks1)
    assert a.shape == (2, L)
    assert (a >= 0).all() and (a < NUM_EMBED + 1).all()
    # the final step samples from the posterior at t=0: MASK should be gone
    assert (a != NUM_EMBED).all()
    np.testing.assert_array_equal(a, np.asarray(toks2))


def test_sampler_tracks_fp_sampler_distribution(setup):
    """Aggregate token statistics of the int8 sampler should track the f32
    fused sampler (same seeds, random weights): compare marginal token
    histograms via total-variation distance."""
    from text_to_sound_synthesis_tpu.models.diffusion.process import (
        sample_tokens_fused,
    )

    model, params, qp, _, cond = setup
    sched = model.schedule()
    n_rep = 12
    cond_rep = jnp.tile(cond, (n_rep, 1, 1))
    t_fp = sample_tokens_fused(model, params, jax.random.PRNGKey(7), cond_rep,
                               truncation_r=0.85)
    t_q = sample_tokens_int8(qp, sched, jax.random.PRNGKey(7), cond_rep,
                             truncation_r=0.85)
    h_fp = np.bincount(np.asarray(t_fp).ravel(), minlength=NUM_EMBED + 1)
    h_q = np.bincount(np.asarray(t_q).ravel(), minlength=NUM_EMBED + 1)
    p = h_fp / h_fp.sum()
    q = h_q / h_q.sum()
    tv = 0.5 * np.abs(p - q).sum()
    # measured ~0.039 (r3); pinned at ~2x so doubled drift fails
    assert tv < 0.08, tv


def test_fast_sampler_int8_tracks_fp_fast_sampler(setup):
    """The strided fast sampler (reference ``sample_fast``; the
    diffsound_fast25step_batch32_int8_static serving row) on the int8 engine:
    valid tokens, deterministic, and marginal-histogram TV vs the f32 fused
    fast sampler within the pinned gate."""
    from text_to_sound_synthesis_tpu.models.diffusion.process import (
        sample_tokens_fused,
    )

    model, params, qp, _, cond = setup
    sched = model.schedule()
    n_rep = 12
    cond_rep = jnp.tile(cond, (n_rep, 1, 1))
    t_q = sample_tokens_int8(qp, sched, jax.random.PRNGKey(9), cond_rep,
                             truncation_r=0.85, skip_step=3)
    t_q2 = sample_tokens_int8(qp, sched, jax.random.PRNGKey(9), cond_rep,
                              truncation_r=0.85, skip_step=3)
    a = np.asarray(t_q)
    assert (a >= 0).all() and (a < NUM_EMBED + 1).all()
    assert (a != NUM_EMBED).all()
    np.testing.assert_array_equal(a, np.asarray(t_q2))

    t_fp = sample_tokens_fused(model, params, jax.random.PRNGKey(9), cond_rep,
                               truncation_r=0.85, skip_step=3)
    h_fp = np.bincount(np.asarray(t_fp).ravel(), minlength=NUM_EMBED + 1)
    h_q = np.bincount(a.ravel(), minlength=NUM_EMBED + 1)
    tv = 0.5 * np.abs(h_fp / h_fp.sum() - h_q / h_q.sum()).sum()
    assert tv < 0.08, tv


def test_sharded_serving_8dev_mesh(setup):
    """Data-parallel int8 serving via shard_map on the virtual 8-device mesh
    (Pallas calls are opaque to GSPMD, so dp serving must go through
    shard_map — this validates the sharding structure with the xla impl)."""
    from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
        sample_tokens_int8_sharded,
    )
    from text_to_sound_synthesis_tpu.parallel.mesh import make_mesh

    model, params, qp, tokens, cond = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=8)
    sched = model.schedule()
    cond8 = jnp.tile(cond[:1], (8, 1, 1)) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(5), (8,) + cond.shape[1:])

    out = sample_tokens_int8_sharded(mesh, qp, sched, jax.random.PRNGKey(3),
                                     cond8, truncation_r=0.85, impl="xla")
    arr = np.asarray(out)
    assert arr.shape == (8, L)
    assert ((arr >= 0) & (arr <= NUM_EMBED)).all()
    # shards drew independent PRNG streams: rows are not all identical
    assert len({tuple(r) for r in arr.tolist()}) > 1

    # mismatched batch raises
    with pytest.raises(ValueError):
        sample_tokens_int8_sharded(mesh, qp, sched, jax.random.PRNGKey(3),
                                   cond8[:6], impl="xla")


@pytest.mark.slow
def test_split_calls_probe_bitwise_identical():
    """TPU-gated regression for the T2S_SPLIT_CALLS probe (docs/ROOFLINE.md
    "The invocation tax, quantified"): sharding the pallas backbone over the
    batch must be BITWISE identical to the unsplit path — the probe's timing
    decomposition (weight-stream bandwidth vs per-invocation overhead) is
    only valid if the math is unchanged."""
    if jax.default_backend() != "tpu":
        pytest.skip("split probe exercises the TPU pallas engine only")
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from probe_split_calls import run_check

    diffs, ulp = run_check(splits=(2, 4))
    # split=2 is bitwise identical; split=4 (2 batch rows per call) was
    # measured at exactly one bf16 ULP — at that batch the tiny per-kernel
    # grids lead Mosaic to a different (valid) layout/rounding choice
    # somewhere in the chain. Gate RELATIVE to the logit magnitude (one bf16
    # ULP of max|logit|, 2^(exp-7)) so a still-one-ULP difference never
    # flakes if init scale or layer count shifts the magnitudes; any real
    # math change trips this immediately.
    assert diffs[2] == 0.0, diffs
    assert diffs[4] <= ulp, (diffs, ulp)


def test_w4_engine_tracks_fp_and_samples(setup):
    """W4A8 engine (weight_bits=4): the jnp/xla paths consume the packed
    engine through the bit-identical unpack twin — logits still track the fp
    forward (coarser int4 weight grid => looser bound than int8), and the
    sampler stays deterministic and valid."""
    from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
        unpack_denoiser,
    )

    model, params, qp8, tokens, cond = setup
    qp4 = quantize_denoiser(params, n_head=HEADS, seq_len=L, num_timesteps=T,
                            weight_bits=4)
    assert qp4.weight_bits == 4
    # packed storage is half the int8 engine's weight bytes
    assert qp4.layers[0].fc1.w_q.shape[0] == qp8.layers[0].fc1.w_q.shape[0] // 2

    tvec = jnp.full((2,), 3, jnp.int32)
    want = model.apply(params, tokens, cond, tvec, method=model.backbone_logits)
    kvs = precompute_cond_kvs(qp4, cond)
    got = int8_backbone_logits(qp4, tokens, jnp.int32(3), kvs)
    w = np.asarray(want, np.float64).ravel()
    g = np.asarray(got, np.float64).ravel()
    rel = np.linalg.norm(g - w) / (np.linalg.norm(w) + 1e-9)
    corr = np.corrcoef(w, g)[0, 1]
    # measured rel ~0.21 on this tiny random 2-layer engine — ~12x the int8
    # engine's 0.017, tracking the 127/7 ≈ 18x coarser int4 weight grid.
    # Threshold at ~2x measured (same policy as the int8 gate above); the
    # production accuracy gate is the flagship drift protocol
    # (tools/eval_int8_drift.py --w4 vs the reseeding floor).
    assert rel < 0.4, rel
    assert corr > 0.95, corr

    # unpack_denoiser is the identity on int8 engines and produces a plain
    # int8 engine from W4 (the non-pallas impls rely on this)
    assert unpack_denoiser(qp8) is qp8
    u = unpack_denoiser(qp4)
    assert u.weight_bits == 8
    assert u.layers[0].fc1.w_q.shape == qp8.layers[0].fc1.w_q.shape

    sched = model.schedule()
    toks1 = sample_tokens_int8(qp4, sched, jax.random.PRNGKey(5), cond,
                               truncation_r=0.85)
    toks2 = sample_tokens_int8(qp4, sched, jax.random.PRNGKey(5), cond,
                               truncation_r=0.85)
    a = np.asarray(toks1)
    assert a.shape == (2, L)
    assert (a >= 0).all() and (a < NUM_EMBED + 1).all() and (a != NUM_EMBED).all()
    np.testing.assert_array_equal(a, np.asarray(toks2))

"""Multi-device GENERATION correctness (VERDICT r4 #3).

BASELINE config 5 is "fast sampler ... data-parallel over ICI"; training
equivalence is pinned in test_parallel.py but nothing checked SAMPLING under
a mesh until now. Both sharded samplers (bf16/f32 fused and int8, full-step
and fast skip-step, dynamic and static scales) must equal the single-device
sampler run per shard with the documented per-shard key fold — bitwise, since
identical math runs on identical shapes (each shard compiles the same B/n
program the reference run uses). The split-calls probe showed layout choices
can flip bf16 ULPs when grids change (test_int8_runtime.py); this gate makes
any such drift in the sharded path loud.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
    quantize_denoiser,
    sample_tokens_int8,
    sample_tokens_int8_sharded,
)
from text_to_sound_synthesis_tpu.models.diffusion.process import (
    sample_tokens_fused,
    sample_tokens_fused_sharded,
)
from text_to_sound_synthesis_tpu.parallel.mesh import make_mesh

T = 10
L = 15
NUM_EMBED = 16
D = 128
HEADS = 4
COND_DIM = 64
S = 7
B = 8


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
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
    tokens0 = jax.random.randint(jax.random.PRNGKey(1), (2, L), 0, NUM_EMBED + 1)
    cond0 = jax.random.normal(jax.random.PRNGKey(2), (2, S, COND_DIM))
    params = model.init(key, tokens0, cond0, jnp.zeros((2,), jnp.int32))
    cond = jax.random.normal(jax.random.PRNGKey(3), (B, S, COND_DIM))
    cond = cond / jnp.linalg.norm(cond, axis=-1, keepdims=True)
    return model, params, cond


def _per_shard_reference(sample_one, key, cond, n_shards):
    """concat_i sample_one(fold_in(key, i), cond_shard_i) — the documented
    semantics of the sharded samplers' per-device PRNG fold."""
    Bs = cond.shape[0] // n_shards
    outs = [np.asarray(sample_one(jax.random.fold_in(key, i),
                                  cond[i * Bs:(i + 1) * Bs]))
            for i in range(n_shards)]
    return np.concatenate(outs, axis=0)


@pytest.mark.parametrize("dp,skip", [(8, 0), (4, 0), (8, 4)])
def test_fused_sampler_sharded_matches_per_shard(setup, dp, skip):
    """bf16/f32 fused sampler under shard_map == per-shard single-device runs
    (full 100-step-analog at skip=0; the fastN strided plan at skip=4)."""
    model, params, cond = setup
    mesh = make_mesh(jax.devices()[:dp])
    key = jax.random.PRNGKey(11)
    got = sample_tokens_fused_sharded(mesh, model, params, key, cond,
                                      truncation_r=0.85, skip_step=skip,
                                      use_kernel=False)
    want = _per_shard_reference(
        lambda k, c: sample_tokens_fused(model, params, k, c,
                                         truncation_r=0.85, skip_step=skip,
                                         use_kernel=False),
        key, cond, dp)
    a = np.asarray(got)
    assert a.shape == (B, L) and (a != NUM_EMBED).all()
    np.testing.assert_array_equal(a, want)


@pytest.mark.parametrize("dp,skip,static", [(8, 0, False), (4, 4, True)])
def test_int8_sampler_sharded_matches_per_shard(setup, dp, skip, static):
    """Int8 serving engine under shard_map == per-shard single-device runs,
    incl. the fast25-analog strided plan on the static-calibrated engine."""
    model, params, cond = setup
    qp = quantize_denoiser(params, n_head=HEADS, seq_len=L, num_timesteps=T)
    sched = model.schedule()
    if static:
        from text_to_sound_synthesis_tpu.models.diffusion.calibrate import (
            calibrate_act_scales,
        )
        scales = calibrate_act_scales(qp, sched, jax.random.PRNGKey(4),
                                      cond[:2], truncation_r=0.85)
        qp = qp.replace(act_scales=scales)

    mesh = make_mesh(jax.devices()[:dp])
    key = jax.random.PRNGKey(13)
    got = sample_tokens_int8_sharded(mesh, qp, sched, key, cond,
                                     truncation_r=0.85, skip_step=skip,
                                     impl="xla")
    want = _per_shard_reference(
        lambda k, c: sample_tokens_int8(qp, sched, k, c, truncation_r=0.85,
                                        skip_step=skip, impl="xla"),
        key, cond, dp)
    a = np.asarray(got)
    assert a.shape == (B, L) and (a != NUM_EMBED).all()
    np.testing.assert_array_equal(a, want)


def test_sharded_sampler_on_dp_times_tp_mesh(setup):
    """Generation shards the data axis of a dp4xtp2 mesh (the training mesh
    shape the dryrun uses) — the model axis is replicated, results unchanged
    vs the pure-dp fold with the same data-axis size."""
    model, params, cond = setup
    mesh = make_mesh(jax.devices()[:8], model=2)  # data=4, model=2
    key = jax.random.PRNGKey(17)
    got = sample_tokens_fused_sharded(mesh, model, params, key, cond,
                                      truncation_r=0.85, use_kernel=False)
    want = _per_shard_reference(
        lambda k, c: sample_tokens_fused(model, params, k, c,
                                         truncation_r=0.85, use_kernel=False),
        key, cond, 4)
    np.testing.assert_array_equal(np.asarray(got), want)

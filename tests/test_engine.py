"""Engine tests: schedulers, grad clip, EMA, jitted train step, multichip DP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.engine.clip_grad import ClipGradNorm
from text_to_sound_synthesis_tpu.engine.ema import ema_update
from text_to_sound_synthesis_tpu.engine.optimizers import build_optimizer, decay_mask
from text_to_sound_synthesis_tpu.engine.schedulers import (
    CosineAnnealingLRWithWarmup,
    ReduceLROnPlateauWithWarmup,
)
from text_to_sound_synthesis_tpu.engine.train_state import DiffusionTrainState, make_train_step
from text_to_sound_synthesis_tpu.parallel.mesh import make_mesh, shard_batch


def test_plateau_scheduler_warmup_then_reduce():
    s = ReduceLROnPlateauWithWarmup(
        base_lr=3e-6, factor=0.5, patience=3, threshold=0.1, threshold_mode="rel",
        min_lr=1e-6, warmup_lr=4.5e-4, warmup=10,
    )
    for _ in range(10):
        s.step(1.0)
    np.testing.assert_allclose(s.lr, 4.5e-4, rtol=1e-6)
    # improving loss: lr stays
    for v in [0.9, 0.7, 0.5, 0.3]:
        s.step(v)
    np.testing.assert_allclose(s.lr, 4.5e-4, rtol=1e-6)
    # plateau: after patience+1 bad steps, halve
    for _ in range(4):
        s.step(0.3)
    np.testing.assert_allclose(s.lr, 2.25e-4, rtol=1e-6)
    # respects min_lr
    for _ in range(100):
        s.step(0.3)
    assert s.lr >= 1e-6


def test_plateau_scheduler_state_roundtrip():
    s = ReduceLROnPlateauWithWarmup(base_lr=1e-4, warmup_lr=1e-3, warmup=5, patience=2, factor=0.5)
    for v in [1.0, 0.9, 0.8, 0.9, 0.9]:
        s.step(v)
    st = s.state_dict()
    s2 = ReduceLROnPlateauWithWarmup(base_lr=1e-4, warmup_lr=1e-3, warmup=5, patience=2, factor=0.5)
    s2.load_state_dict(st)
    for v in [0.9, 0.9, 0.9]:
        a, b = s.step(v), s2.step(v)
        assert a == b


def test_cosine_scheduler():
    s = CosineAnnealingLRWithWarmup(base_lr=0.0, T_max=110, min_lr=1e-6, warmup_lr=1e-3, warmup=10)
    for _ in range(10):
        s.step()
    np.testing.assert_allclose(s.lr, 1e-3, rtol=1e-6)
    mid = None
    for i in range(100):
        s.step()
        if i == 49:
            mid = s.lr
    assert mid == pytest.approx(0.5e-3, rel=0.05)
    assert s.lr == pytest.approx(1e-6, abs=1e-7)


def test_clip_grad_window():
    # reference semantics (clip_grad_norm.py:20-28): conditions are OR-ed,
    # so start=0 means ALWAYS clipped — even past end_iteration
    clip = ClipGradNorm(start_iteration=0, end_iteration=10, max_norm=0.5)
    g = {"w": jnp.full((100,), 1.0)}
    clipped, norm = clip(g, jnp.asarray(5))
    assert float(norm) == pytest.approx(10.0)
    gn = float(jnp.linalg.norm(clipped["w"]))
    assert gn == pytest.approx(0.5, rel=1e-3)
    clipped, _ = clip(g, jnp.asarray(100))  # start=0 keeps it active forever
    assert float(jnp.linalg.norm(clipped["w"])) == pytest.approx(0.5, rel=1e-3)

    # before start and past a positive end: inactive
    clip2 = ClipGradNorm(start_iteration=50, end_iteration=10, max_norm=0.5)
    clipped, _ = clip2(g, jnp.asarray(20))
    np.testing.assert_allclose(np.asarray(clipped["w"]), 1.0)
    # ... but iter < end keeps it on even before start (the OR)
    clipped, _ = clip2(g, jnp.asarray(5))
    assert float(jnp.linalg.norm(clipped["w"])) == pytest.approx(0.5, rel=1e-3)
    # end_iteration=-1 ("always clipped" comment): active via start=0
    clip3 = ClipGradNorm(max_norm=0.5)
    clipped, _ = clip3(g, jnp.asarray(10**6))
    assert float(jnp.linalg.norm(clipped["w"])) == pytest.approx(0.5, rel=1e-3)


def test_ema_update_gated():
    ema = {"a": jnp.zeros(3)}
    cur = {"a": jnp.ones(3)}
    out = ema_update(ema, cur, 0.9, True)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1, rtol=1e-5)
    out2 = ema_update(ema, cur, 0.9, False)
    np.testing.assert_allclose(np.asarray(out2["a"]), 0.0)


def test_decay_mask_kernels_only():
    params = {
        "block": {"attn": {"kernel": jnp.zeros((2, 2)), "bias": jnp.zeros(2)},
                  "emb": {"embedding": jnp.zeros((4, 2))},
                  "ln": {"scale": jnp.zeros(2), "bias": jnp.zeros(2)}},
    }
    mask = decay_mask(params)
    assert mask["block"]["attn"]["kernel"] is True
    assert mask["block"]["attn"]["bias"] is False
    assert mask["block"]["emb"]["embedding"] is False
    assert mask["block"]["ln"]["scale"] is False


# ---------------------------------------------------------------------------
# jitted train step on the tiny composite
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_setup():
    from tests.test_composite import TINY_MODEL_CFG, _has_bpe
    if not _has_bpe():
        pytest.skip("BPE artifact unavailable")
    from text_to_sound_synthesis_tpu.models.diffsound import build_model
    model = build_model(TINY_MODEL_CFG)
    params = model.init_params(jax.random.PRNGKey(0), mel_shape=(1, 4, 16, 1))
    return model, params


def _batch(model, rng, B=4):
    toks = model.text_to_tokens(["a dog barks"] * B)["token"][:, :12]
    return {
        "image": rng.standard_normal((B, 4, 16, 1)).astype(np.float32),
        "condition_token": np.asarray(toks, np.int32),
    }


def test_train_step_updates_and_loss_decreases(tiny_setup, rng):
    model, params = tiny_setup
    tx = build_optimizer({"target": "adamw", "params": {"betas": (0.9, 0.96), "weight_decay": 0.045}}, 1e-3)
    clip = ClipGradNorm(0, 5000, 0.5)
    step = make_train_step(model, tx, clip, ema_decay=0.9, ema_interval=2, donate=False)
    state = DiffusionTrainState.create(params["diffusion"], tx, num_timesteps=4)
    frozen = {"codec": params["codec"], "cond": params["cond"]}
    batch = jax.tree_util.tree_map(jnp.asarray, _batch(model, rng))

    losses = []
    for i in range(12):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(i), 1e-3)
        losses.append(float(metrics.loss))
    assert int(state.step) == 12
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])  # same batch -> must improve
    # Lt state accumulated
    assert float(jnp.sum(state.lt.Lt_count)) == pytest.approx(12 * 4)
    # EMA differs from params but tracks them
    d = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a, b: jnp.abs(a - b).max(), state.ema_params, state.params)
    )
    assert max(float(x) for x in d) > 0


@pytest.mark.multichip
def test_train_step_data_parallel_8dev(tiny_setup, rng):
    """Same step, batch sharded over an 8-device mesh — gradient all-reduce is
    inserted by XLA; result must match the single-device run."""
    model, params = tiny_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    tx = build_optimizer({"target": "adamw", "params": {}}, 1e-3)
    step = make_train_step(model, tx, None, donate=False)
    state = DiffusionTrainState.create(params["diffusion"], tx, num_timesteps=4)
    frozen = {"codec": params["codec"], "cond": params["cond"]}

    batch_host = _batch(model, rng, B=8)
    sharded = shard_batch(batch_host, mesh)
    state2, metrics = step(state, frozen, sharded, jax.random.PRNGKey(0), 1e-3)
    assert np.isfinite(float(metrics.loss))

    # replicated-run equivalence
    state3, metrics_rep = step(state, frozen, jax.tree_util.tree_map(jnp.asarray, batch_host),
                               jax.random.PRNGKey(0), 1e-3)
    np.testing.assert_allclose(float(metrics.loss), float(metrics_rep.loss), rtol=1e-4)


@pytest.mark.multichip
def test_data_parallel_generation_8dev(tiny_setup, rng):
    """BASELINE config 5: batched generation data-parallel over the mesh —
    cond batch sharded on 'data', sampler jitted once, XLA partitions it."""
    from text_to_sound_synthesis_tpu.models.diffusion.process import sample_tokens_fused
    from text_to_sound_synthesis_tpu.parallel.mesh import batch_sharding

    model, params = tiny_setup
    mesh = make_mesh()
    toks = model.text_to_tokens(["a dog barks"] * 8)["token"][:, :12]
    cond_tokens = jax.device_put(jnp.asarray(toks, jnp.int32),
                                 batch_sharding(mesh, ndim=2))

    @jax.jit
    def gen(params, key, cond_tokens):
        cond_emb = model.embed_condition(params, cond_tokens)
        return sample_tokens_fused(model.diffusion, params["diffusion"], key,
                                   cond_emb, truncation_r=0.85, use_kernel=False,
                                   skip_step=1)
    out = gen({"codec": params["codec"], "cond": params["cond"],
               "diffusion": params["diffusion"]}, jax.random.PRNGKey(0), cond_tokens)
    assert out.shape == (8, 16)
    arr = np.asarray(out)
    assert ((arr >= 0) & (arr <= 10)).all()


def test_async_checkpoint_roundtrip(tmp_path):
    """Async orbax saves commit atomically and restore identically; the
    solver's save path uses async_save=True (engine/solver.py)."""
    from text_to_sound_synthesis_tpu.engine.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
        wait_for_checkpoints,
    )

    state = {"w": jnp.arange(8.0), "step": jnp.asarray(3, jnp.int32)}
    save_checkpoint(str(tmp_path), "last", state,
                    {"epoch": 1, "last_iter": 3}, async_save=True)
    # a second in-flight save must serialize, not corrupt
    save_checkpoint(str(tmp_path), "0e_3iter", state, None, async_save=True)
    wait_for_checkpoints()

    # same iteration -> 'last' wins the tie
    assert latest_checkpoint(str(tmp_path)) == "last"
    got, host = restore_checkpoint(str(tmp_path), "last", template=state)
    np.testing.assert_array_equal(np.asarray(got["w"]), np.arange(8.0))
    assert int(got["step"]) == 3
    assert host == {"epoch": 1, "last_iter": 3}
    got2, host2 = restore_checkpoint(str(tmp_path), "0e_3iter", template=state)
    np.testing.assert_array_equal(np.asarray(got2["w"]), np.arange(8.0))
    assert host2 is None

    # a NEWER async ping-pong slot (the solver's per-epoch saves) outranks a
    # stale 'last'
    save_checkpoint(str(tmp_path), "auto_a", state,
                    {"epoch": 2, "last_iter": 7}, async_save=True)
    wait_for_checkpoints()
    assert latest_checkpoint(str(tmp_path)) == "auto_a"

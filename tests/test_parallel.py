"""Numerical equivalence of the distributed shardings (virtual 8-dev mesh).

The dp/tp rules in parallel/{mesh,sharding}.py are GSPMD layout constraints,
so any spec compiles — the thing worth GUARDING is that sharded execution
computes the SAME math as one device: identical loss and gradients for the
stage-2 train loss under pure data parallelism and under dp x Megatron-tp.

Replaces what the reference could never test without GPUs (SURVEY.md §4):
its DDP (`Diffsound/sound_synthesis/distributed/distributed.py:16-151`)
changes gradient math silently if a bucket is mis-reduced; here the
equivalence is pinned as a test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
from text_to_sound_synthesis_tpu.models.diffusion.process import (
    TimestepSamplerState,
    sample_timesteps,
)
from text_to_sound_synthesis_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
from text_to_sound_synthesis_tpu.parallel.sharding import (
    apply_shardings,
    megatron_param_shardings,
)

T = 6
L = 16
S = 8
D = 64          # n_embd: head_dim 16 x 4 heads, tp=2 splits cleanly
COND_D = 32
B = 8


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = DiscreteDiffusion(
        transformer_config={"params": dict(
            n_layer=2, n_embd=D, n_head=4, content_seq_len=L,
            condition_dim=COND_D, content_spatial_size=(2, 8),
            block_activate="GELU2",
        )},
        content_emb_config={"params": dict(num_embed=16, embed_dim=D,
                                           spatial_size=(2, 8))},
        diffusion_step=T,
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, L), jnp.int32),
                        jnp.zeros((1, S, COND_D), jnp.float32),
                        jnp.zeros((1,), jnp.int32))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(0, 16, (B, L)), jnp.int32)
    cond = jnp.asarray(rng.standard_normal((B, S, COND_D)), jnp.float32)
    return model, params, x0, cond


def _loss_and_grads(model, params, x0, cond):
    k = jax.random.PRNGKey(3)
    k_t, k_loss = jax.random.split(k)
    t, pt = sample_timesteps(k_t, TimestepSamplerState.create(T), B, T)

    def loss_fn(p):
        out = model.apply(p, k_loss, x0, cond, t, pt, is_train=True,
                          method=model.train_loss, rngs={"dropout": k_loss})
        return out.loss

    return jax.value_and_grad(loss_fn)(params)


def _flat(tree):
    return {jax.tree_util.keystr(kp): np.asarray(v)
            for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_dp_and_tp_match_single_device(setup):
    model, params, x0, cond = setup

    # ground truth: one device
    dev0 = jax.devices()[0]
    loss_1, grads_1 = jax.jit(
        lambda p, a, c: _loss_and_grads(model, p, a, c), device=dev0
    )(params, x0, cond)
    loss_1 = float(loss_1)
    g1 = _flat(grads_1)

    configs = [("dp8", 1), ("dp4_tp2", 2)]
    for name, tp in configs:
        mesh = make_mesh(model=tp)
        if tp == 1:
            p_sh = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, replicated_sharding(mesh)), params)
        else:
            p_sh = apply_shardings(params, megatron_param_shardings(params, mesh))
        x_sh = jax.device_put(x0, batch_sharding(mesh, ndim=2))
        c_sh = jax.device_put(cond, batch_sharding(mesh, ndim=3))
        with mesh:
            loss_n, grads_n = jax.jit(
                lambda p, a, c: _loss_and_grads(model, p, a, c))(p_sh, x_sh, c_sh)
        loss_n = float(jax.device_get(loss_n))
        assert abs(loss_n - loss_1) < 1e-4 * max(1.0, abs(loss_1)), (
            name, loss_n, loss_1)
        gn = _flat(jax.device_get(grads_n))
        assert set(gn) == set(g1)
        for kname, v in g1.items():
            # atol floor: attention key-bias grads are ~0 by softmax shift
            # invariance (max ~1e-8), where relative error is pure noise
            diff = np.max(np.abs(gn[kname] - v))
            tol = 1e-6 + 5e-4 * np.max(np.abs(v))
            assert diff < tol, (name, kname, diff, tol)


def test_megatron_sharding_rules(setup):
    model, params, x0, cond = setup
    mesh = make_mesh(model=2)
    sh = megatron_param_shardings(params, mesh)
    flat = {jax.tree_util.keystr(kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(
                sh, is_leaf=lambda x: isinstance(x, NamedSharding))[0]}
    col = [k for k in flat
           if ("query" in k or "mlp_fc1" in k) and k.endswith("['kernel']")]
    row = [k for k in flat
           if ("proj" in k or "mlp_fc2" in k) and k.endswith("['kernel']")]
    assert col and row
    for k in col:
        assert flat[k].spec == P(None, "model"), (k, flat[k].spec)
    for k in row:
        assert flat[k].spec == P("model", None), (k, flat[k].spec)
    # biases / norms replicated
    bias = [k for k in flat if k.endswith("['bias']")]
    assert bias and all(flat[k].spec == P() for k in bias)


def test_shard_batch_handles_scalar_and_rank0_leaves():
    # a batch dict may carry rank-0 leaves (step counters, python scalars);
    # they have no batch axis — shard_batch must replicate them, not crash
    from text_to_sound_synthesis_tpu.parallel.mesh import shard_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=8)
    batch = {"mel": np.ones((8, 4, 4), np.float32),
             "step": np.float32(3.0),
             "flag": 7}
    out = shard_batch(batch, mesh)
    assert out["mel"].sharding.spec == P("data", None, None)
    assert out["step"].sharding.spec == P()
    assert int(out["flag"]) == 7 and float(out["step"]) == 3.0
    # rank-0 default via batch_sharding too
    assert batch_sharding(mesh, ndim=0).spec == P()
    assert batch_sharding(mesh).spec == P("data")

"""End-to-end learning test: the discrete-diffusion stack memorizes a tiny
conditional dataset and conditional generation recovers it.

This is the system-level check the reference never had (SURVEY.md §4): train
loss -> gradients -> importance-sampled timesteps -> EMA-free optimization ->
fused sampler, all verified to produce the right tokens for the right caption.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
from text_to_sound_synthesis_tpu.models.diffusion.process import (
    TimestepSamplerState,
    sample_timesteps,
    sample_tokens_fused,
    update_timestep_state,
)


@pytest.mark.slow
def test_diffusion_memorizes_conditional_dataset():
    L, K_tok, T = 12, 10, 8
    model = DiscreteDiffusion(
        transformer_config={"params": dict(
            n_layer=2, n_embd=64, n_head=4, content_seq_len=L,
            condition_dim=8, content_spatial_size=(3, 4))},
        content_emb_config={"params": dict(num_embed=K_tok, embed_dim=64,
                                           spatial_size=(3, 4))},
        diffusion_step=T, auxiliary_loss_weight=5e-4,
    )
    rng = np.random.default_rng(0)
    conds = jnp.asarray(np.stack([np.ones((5, 8)), -np.ones((5, 8))]), jnp.float32)
    x0s = jnp.asarray(np.stack([rng.integers(0, K_tok, L),
                                rng.integers(0, K_tok, L)]), jnp.int32)

    params = model.init(jax.random.PRNGKey(0), x0s, conds, jnp.zeros((2,), jnp.int32))
    tx = optax.adam(2e-3)
    opt = tx.init(params)
    lt = TimestepSamplerState.create(T)

    @jax.jit
    def step(params, opt, lt, key):
        k1, k2 = jax.random.split(key)
        t, pt = sample_timesteps(k1, lt, 2, T)

        def loss_fn(p):
            out = model.apply(p, k2, x0s, conds, t, pt, is_train=True,
                              method=model.train_loss, rngs={"dropout": k2})
            return out.loss, out

        (loss, out), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, \
            update_timestep_state(lt, t, out.kl_loss), loss

    key = jax.random.PRNGKey(1)
    loss = None
    for _ in range(500):
        key, k = jax.random.split(key)
        params, opt, lt, loss = step(params, opt, lt, k)
    assert float(loss) < 0.1, f"did not converge: loss {float(loss)}"

    accs = []
    for trial in range(3):
        toks = sample_tokens_fused(model, params, jax.random.PRNGKey(100 + trial),
                                   conds, truncation_r=0.85, use_kernel=False)
        accs.append((np.asarray(toks) == np.asarray(x0s)).mean(axis=1))
    acc = np.mean(accs, axis=0)
    assert (acc > 0.8).all(), f"conditional recall too low: {acc}"
    # importance sampler engaged after warmup
    assert float(jnp.min(lt.Lt_count)) > 10

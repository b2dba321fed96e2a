"""MelGAN training step smoke test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from text_to_sound_synthesis_tpu.engine.vocoder_solver import (
    VocoderTrainState,
    make_vocoder_train_step,
    mel_for_vocoder,
)
from text_to_sound_synthesis_tpu.models.melgan import MelGANDiscriminator, MelGANGenerator


def test_mel_for_vocoder_shapes(rng):
    wav = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    mel = mel_for_vocoder(wav)
    assert mel.shape == (2, 32, 80)


@pytest.mark.slow
def test_vocoder_train_step(rng):
    gen = MelGANGenerator(input_size=80, ngf=4, n_residual_layers=1)
    disc = MelGANDiscriminator(num_D=2, ndf=4, n_layers=2)
    wav = jnp.asarray((0.1 * rng.standard_normal((2, 4096))).astype(np.float32))

    mel = mel_for_vocoder(wav)
    g_params = gen.init(jax.random.PRNGKey(0), mel)
    d_params = disc.init(jax.random.PRNGKey(1), wav[..., None])
    tx = optax.adam(1e-4, b1=0.5, b2=0.9)
    step = make_vocoder_train_step(gen, disc, tx, tx, num_D=2, n_layers_D=2, donate=False)
    state = VocoderTrainState.create(g_params, d_params, tx, tx)

    for i in range(3):
        state, metrics = step(state, wav)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, v)
    assert int(state.step) == 3

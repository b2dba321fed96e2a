"""MelGAN tests: transposed-conv parity vs torch CPU, generator/discriminator geometry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.models.melgan import MelGANDiscriminator, MelGANGenerator
from text_to_sound_synthesis_tpu.models.melgan.generator import conv_transpose_1d

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("ratio", [8, 2])
def test_conv_transpose_matches_torch(rng, ratio):
    """Exact ConvTranspose1d semantics (kernel 2r, stride r, pad r//2+r%2,
    output_padding r%2) — the MelGAN upsampling configuration."""
    cin, cout, T = 6, 4, 10
    k, s, p, op = ratio * 2, ratio, ratio // 2 + ratio % 2, ratio % 2
    x = rng.standard_normal((2, cin, T)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)

    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), stride=s, padding=p, output_padding=op
    ).numpy()

    # ours: NWC input, kernel (k, Cout, Cin)
    x_nwc = jnp.asarray(x.transpose(0, 2, 1))
    kernel = jnp.asarray(w.transpose(2, 1, 0))
    got = np.asarray(conv_transpose_1d(x_nwc, kernel, s, p, op)).transpose(0, 2, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_generator_upsamples_256x(rng):
    gen = MelGANGenerator(input_size=80, ngf=8, n_residual_layers=1)
    mel = jnp.asarray(rng.standard_normal((1, 20, 80)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (1, 20 * 256, 1)
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_discriminator_scales_and_features(rng):
    disc = MelGANDiscriminator(num_D=3, ndf=4, n_layers=2, downsampling_factor=4)
    wav = jnp.asarray(rng.standard_normal((1, 4096, 1)).astype(np.float32))
    params = disc.init(jax.random.PRNGKey(0), wav)
    out = disc.apply(params, wav)
    assert len(out) == 3                      # three scales
    assert len(out[0]) == 2 + 2 + 1           # layer_0 .. layer_{n+2} feature maps
    # each successive scale sees a 2x shorter signal
    assert out[1][0].shape[1] == out[0][0].shape[1] // 2


def test_grouped_conv_matches_torch(rng):
    """The discriminator's grouped strided conv (modules.py:150-160) vs torch."""
    cin, cout, T, k, s, groups = 8, 16, 64, 41, 4, 2
    x = rng.standard_normal((1, cin, T)).astype(np.float32)
    w = rng.standard_normal((cout, cin // groups, k)).astype(np.float32)
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), stride=s, padding=20, groups=groups
    ).numpy()

    from jax import lax
    got = lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(w.transpose(2, 1, 0)),  # (k, cin/groups, cout)
        window_strides=(s,), padding=[(20, 20)], feature_group_count=groups,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=1e-4)

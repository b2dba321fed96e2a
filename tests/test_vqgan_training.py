"""Stage-1 training tests: LPAPS, discriminator, adversarial train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.engine.vqgan_solver import (
    VQGANLossConfig,
    VQGANTrainState,
    build_gan_optimizer,
    make_vqgan_train_step,
)
from text_to_sound_synthesis_tpu.models.discriminator import NLayerDiscriminator
from text_to_sound_synthesis_tpu.models.lpaps import LPAPS, VGGishish
from text_to_sound_synthesis_tpu.models.vqgan import VQModel
from text_to_sound_synthesis_tpu.ops.gan import (
    adopt_weight,
    feature_matching_l1,
    hinge_d_loss,
    vanilla_d_loss,
)

SMALL_DD = dict(double_z=False, z_channels=16, resolution=32, in_channels=1,
                out_ch=1, ch=16, ch_mult=[1, 2], num_res_blocks=1,
                attn_resolutions=[16], dropout=0.0)


def test_hinge_and_vanilla_losses():
    real = jnp.asarray([2.0, 2.0])
    fake = jnp.asarray([-2.0, -2.0])
    assert float(hinge_d_loss(real, fake)) == 0.0  # perfect discriminator
    assert float(hinge_d_loss(-real, -fake)) == pytest.approx(3.0)
    v = float(vanilla_d_loss(real, fake))
    assert 0 < v < 0.3


def test_adopt_weight():
    assert float(adopt_weight(1.0, jnp.asarray(5), threshold=10)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(15), threshold=10)) == 1.0


def test_vggishish_features_and_logits(rng):
    model = VGGishish(num_classes=7)
    x = jnp.asarray(rng.standard_normal((1, 80, 96)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (1, 7)
    feats = model.apply(params, x, return_features=True)
    assert len(feats) == 5
    assert feats[0].shape == (1, 80, 96, 64)     # relu1_2
    assert feats[-1].shape == (1, 5, 6, 512)     # relu5_3 after 4 MPs


def test_lpaps_zero_for_identical(rng):
    lp = LPAPS()
    x = jnp.asarray(rng.standard_normal((2, 80, 96, 1)).astype(np.float32))
    params = lp.init(jax.random.PRNGKey(0), x, x)
    out = lp.apply(params, x, x)
    assert out.shape == (2,)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    y = x + 0.5 * jnp.asarray(np.random.default_rng(1).standard_normal(x.shape), jnp.float32)
    out2 = lp.apply(params, x, y)
    assert (np.asarray(out2) > 0).all()


def test_discriminator_patch_logits(rng):
    disc = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=2)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 1)).astype(np.float32))
    variables = disc.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    out = disc.apply(variables, x, train=False)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    out2, mut = disc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut


@pytest.mark.slow
def test_vqgan_train_step_improves_recon(rng):
    codec = VQModel(ddconfig=SMALL_DD, n_embed=16, embed_dim=16)
    disc = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=2)
    mel = jnp.asarray(rng.standard_normal((2, 16, 32, 1)).astype(np.float32) * 0.5)

    ae_params = codec.init(jax.random.PRNGKey(0), mel)
    disc_vars = disc.init(jax.random.PRNGKey(1), mel)
    tx_ae = build_gan_optimizer(1e-3)
    tx_disc = build_gan_optimizer(1e-3)
    # no LPAPS net in this smoke test (perceptual_weight=0)
    cfg = VQGANLossConfig(disc_start=12, perceptual_weight=0.0,
                          min_adapt_weight=0.0, max_adapt_weight=1e4)
    step = make_vqgan_train_step(codec, None, disc, tx_ae, tx_disc, cfg, donate=False)
    state = VQGANTrainState.create(ae_params, disc_vars, tx_ae, tx_disc)

    nlls = []
    for i in range(16):
        state, metrics = step(state, None, mel, 1e-3)
        nlls.append(float(metrics["nll_loss"]))
        assert np.isfinite(nlls[-1])
    # pre-adversarial phase: same batch -> reconstruction must improve
    assert min(nlls[:12]) < nlls[0]
    assert int(state.step) == 16
    # after disc_start, adversarial parts engage and stay finite
    assert float(metrics["disc_factor"]) == 1.0
    assert np.isfinite(float(metrics["disc_loss"]))
    assert np.isfinite(float(metrics["d_weight"]))


def test_feature_matching_l1():
    # reference weighting (train.py:167-176): per-map wt = 4/(n_layers_D+1)
    # * 1/num_D = 4/(len(scale)-2) * 1/num_D; only the non-final maps count
    real = [[jnp.ones((1, 4, 2)), jnp.zeros((1, 4, 1))]]
    fake = [[jnp.zeros((1, 4, 2)), jnp.ones((1, 4, 1))]]
    out = float(feature_matching_l1(real, fake))
    assert out == pytest.approx(4.0)  # one map, |1-0|=1, wt = 4/1 * 1/1

    # 2 scales x (3 maps + logits) = n_layers_D 1 -> wt = 4/(1+1) * 1/2 = 1
    real2 = [[jnp.full((2, 3), 2.0)] * 3 + [jnp.zeros((2, 1))]] * 2
    fake2 = [[jnp.zeros((2, 3))] * 3 + [jnp.ones((2, 1))]] * 2
    out2 = float(feature_matching_l1(real2, fake2))
    assert out2 == pytest.approx(2 * 3 * 1.0 * 2.0)  # scales x maps x wt x L1


# -- AE-only variants (VQNoDiscModel / VQSegmentationModel, vqgan.py:232-331) --

def test_nodisc_train_step_improves_recon(rng):
    import optax

    from text_to_sound_synthesis_tpu.engine.vqgan_solver import (
        make_vqgan_nodisc_train_step,
    )
    from text_to_sound_synthesis_tpu.models.vqgan import VQNoDiscModel

    codec = VQNoDiscModel(ddconfig=SMALL_DD, n_embed=8, embed_dim=16)
    mel = jnp.asarray(rng.standard_normal((2, 8, 32, 1)).astype(np.float32))
    ae_params = codec.init(jax.random.PRNGKey(0), mel)
    tx = build_gan_optimizer(1e-3)
    state = VQGANTrainState.create(ae_params, {"params": {}}, tx, optax.identity())
    step = make_vqgan_nodisc_train_step(codec, None, tx, VQGANLossConfig(),
                                        donate=False)
    state, m0 = step(state, None, mel, 1e-3)
    for _ in range(6):
        state, m = step(state, None, mel, 1e-3)
    assert float(m["nll_loss"]) < float(m0["nll_loss"])
    assert np.isfinite(float(m["total_loss"]))


def test_segmentation_model_and_train_step(rng):
    import optax

    from text_to_sound_synthesis_tpu.engine.vqgan_solver import (
        make_vqgan_segmentation_train_step,
    )
    from text_to_sound_synthesis_tpu.models.vqgan import VQSegmentationModel

    n_labels = 4
    dd = dict(SMALL_DD, in_channels=n_labels, out_ch=n_labels)
    codec = VQSegmentationModel(ddconfig=dd, n_embed=8, embed_dim=16,
                                n_labels=n_labels)
    labels = rng.integers(0, n_labels, (2, 8, 32))
    onehot = jnp.asarray(np.eye(n_labels, dtype=np.float32)[labels])
    ae_params = codec.init(jax.random.PRNGKey(0), onehot)
    tx = build_gan_optimizer(1e-3)
    state = VQGANTrainState.create(ae_params, {"params": {}}, tx, optax.identity())
    step = make_vqgan_segmentation_train_step(codec, tx, donate=False)
    state, m0 = step(state, None, onehot, 1e-3)
    for _ in range(6):
        state, m = step(state, None, onehot, 1e-3)
    assert float(m["nll_loss"]) < float(m0["nll_loss"])

    logits, _ = codec.apply(state.ae_params, onehot)
    rgb = codec.apply(state.ae_params, logits, jax.random.PRNGKey(1),
                      method=codec.segmentation_to_rgb)
    assert rgb.shape == (2, 8, 32, 3)
    assert float(jnp.max(rgb)) <= 1.0 and float(jnp.min(rgb)) >= -1.0


def test_segmentation_model_label_channel_mismatch_raises(rng):
    from text_to_sound_synthesis_tpu.models.vqgan import VQSegmentationModel

    # n_labels without matching ddconfig.out_ch used to silently build a
    # 1-channel decoder; now it fails at construction time
    codec = VQSegmentationModel(ddconfig=dict(SMALL_DD), n_embed=8,
                                embed_dim=16, n_labels=4)
    with pytest.raises(ValueError, match="out_ch"):
        codec.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 4)))

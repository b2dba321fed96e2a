"""VQGAN codec tests: quantizer math, encoder/decoder geometry, round trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.models.vqgan import VectorQuantizer, VQModel
from text_to_sound_synthesis_tpu.models.vqgan.quantize import nearest_codebook_indices

# small ddconfig: 4x downsample over a 16x64 "mel", attn at time-res 16
SMALL_DD = dict(
    double_z=False, z_channels=32, resolution=64, in_channels=1, out_ch=1,
    ch=16, ch_mult=[1, 2, 4], num_res_blocks=1, attn_resolutions=[16], dropout=0.0,
)


def test_nearest_codebook_indices_exact(rng):
    z = rng.standard_normal((50, 8)).astype(np.float32)
    cb = rng.standard_normal((16, 8)).astype(np.float32)
    got = np.asarray(nearest_codebook_indices(jnp.asarray(z), jnp.asarray(cb)))
    want = np.argmin(((z[:, None, :] - cb[None, :, :]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(got, want)


def test_quantizer_straight_through_and_loss(rng):
    vq = VectorQuantizer(n_e=16, e_dim=8, beta=0.25)
    z = jnp.asarray(rng.standard_normal((2, 3, 4, 8)).astype(np.float32))
    params = vq.init(jax.random.PRNGKey(0), z)
    out = vq.apply(params, z)
    assert out.z_q.shape == z.shape
    assert out.indices.shape == (2, 3, 4)
    assert out.loss.shape == ()
    assert float(out.perplexity) > 1.0

    # straight-through: d z_q / d z == identity
    def f(z):
        return jnp.sum(vq.apply(params, z).z_q * 2.0)

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), 2.0, atol=1e-6)

    # codebook gradient flows through the loss only
    def f2(p):
        return vq.apply(p, z).loss

    gp = jax.grad(f2)(params)
    assert np.abs(np.asarray(gp["params"]["codebook"])).sum() > 0


def test_quantizer_get_codebook_entry(rng):
    vq = VectorQuantizer(n_e=16, e_dim=8)
    z = jnp.asarray(rng.standard_normal((1, 2, 2, 8)).astype(np.float32))
    params = vq.init(jax.random.PRNGKey(0), z)
    out = vq.apply(params, z)
    entries = vq.apply(params, out.indices, method=vq.get_codebook_entry)
    # quantized (pre straight-through) values equal the gathered codebook rows
    cb = np.asarray(params["params"]["codebook"])
    want = cb[np.asarray(out.indices)]
    np.testing.assert_allclose(np.asarray(entries), want, atol=1e-6)


@pytest.fixture(scope="module")
def small_vqmodel():
    model = VQModel(ddconfig=SMALL_DD, n_embed=32, embed_dim=32)
    x = jnp.zeros((1, 16, 64, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_vqmodel_encode_geometry(small_vqmodel, rng):
    model, params = small_vqmodel
    x = jnp.asarray(rng.standard_normal((2, 16, 64, 1)).astype(np.float32))
    quant, vq = model.apply(params, x, method=model.encode)
    # 3 levels => 4x downsample: (16, 64) -> (4, 16)
    assert quant.shape == (2, 4, 16, 32)
    assert vq.indices.shape == (2, 4, 16)
    assert vq.indices.dtype == jnp.int32


def test_vqmodel_roundtrip_shapes(small_vqmodel, rng):
    model, params = small_vqmodel
    x = jnp.asarray(rng.standard_normal((1, 16, 64, 1)).astype(np.float32))
    xrec, vq = model.apply(params, x)
    assert xrec.shape == x.shape
    # decode_code reproduces decode(quantized) exactly
    rec2 = model.apply(params, vq.indices, method=model.decode_code)
    # note: decode() in __call__ consumed straight-through z_q == gathered entries
    np.testing.assert_allclose(np.asarray(rec2), np.asarray(xrec), atol=1e-5)


@pytest.mark.slow
def test_vqmodel_full_size_token_grid():
    """Production config: 80x848 mel -> 5x53 = 265 tokens (caps.yaml:11-23)."""
    dd = dict(double_z=False, z_channels=256, resolution=848, in_channels=1,
              out_ch=1, ch=128, ch_mult=[1, 1, 2, 2, 4], num_res_blocks=2,
              attn_resolutions=[53], dropout=0.0)
    model = VQModel(ddconfig=dd, n_embed=256, embed_dim=256)
    x = jnp.zeros((1, 80, 848, 1))
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    # geometry via eval_shape (no heavy compute): encode output
    quant_shape = jax.eval_shape(
        lambda p, x: model.apply(p, x, method=model.encode), params, x
    )
    assert quant_shape[0].shape == (1, 5, 53, 256)
    assert quant_shape[1].indices.shape == (1, 5, 53)


def test_vqmodel1d_roundtrip(rng):
    from text_to_sound_synthesis_tpu.models.vqgan.modules1d import VQModel1d

    dd = dict(double_z=False, z_channels=16, resolution=32, in_channels=24,
              out_ch=24, ch=16, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[16], dropout=0.0)
    model = VQModel1d(ddconfig=dd, n_embed=8, embed_dim=16)
    x = jnp.asarray(rng.standard_normal((2, 32, 24)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, vq = model.apply(params, x)
    assert rec.shape == x.shape
    assert vq.indices.shape == (2, 16)  # one downsample
    rec2 = model.apply(params, vq.indices, method=model.decode_code)
    np.testing.assert_allclose(np.asarray(rec2), np.asarray(rec), atol=1e-5)

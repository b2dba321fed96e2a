"""Long-form generation: permuter length re-derivation + chunked cross-fade.

Reference: the permuter can re-derive indices for longer sequences
(``Codebook/specvqgan/modules/transformer/permuter.py:31-49``); the Diffsound
path itself never generates past the 265-token window. ``generate_long`` is
the TPU-native long-form capability built on those semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.ops import permuter as P


def test_column_major_rederives_for_longer_sequences():
    # reference make_idx(H, W*scale) semantics (permuter.py:38-44)
    p = P.ColumnMajor(2, 3)
    x = jnp.arange(12)[None]  # scale 2
    want = np.arange(12).reshape(2, 6).T.ravel()
    np.testing.assert_array_equal(np.asarray(p(x))[0], want)
    np.testing.assert_array_equal(np.asarray(p(p(x), reverse=True))[0],
                                  np.arange(12))
    # base length still uses the precomputed index
    np.testing.assert_array_equal(np.asarray(p(jnp.arange(6)[None]))[0],
                                  np.arange(6).reshape(2, 3).T.ravel())


def test_column_major_rejects_non_multiple_lengths():
    p = P.ColumnMajor(2, 3)
    with pytest.raises(ValueError):
        p(jnp.arange(8)[None])


def _tiny_model():
    from tests.test_composite import TINY_MODEL_CFG, _has_bpe
    from text_to_sound_synthesis_tpu.models.diffsound import build_model

    if not _has_bpe():
        pytest.skip("BPE artifact unavailable")
    return build_model(TINY_MODEL_CFG)


@pytest.mark.slow
def test_generate_long_shapes(rng):
    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(0), mel_shape=(1, 4, 16, 1))
    toks = jnp.asarray(model.text_to_tokens(["water drips"])["token"][:, :12])

    seg = model.time_downsample * model.token_hw[1]
    assert seg == 16
    out = model.generate_long(params, jax.random.PRNGKey(1), toks,
                              duration_frames=28, overlap_frames=4)
    assert out.shape == (1, 4, 28, 1)
    assert np.isfinite(np.asarray(out)).all()

    # short request degrades to a single segment, trimmed
    out = model.generate_long(params, jax.random.PRNGKey(1), toks,
                              duration_frames=10, overlap_frames=4)
    assert out.shape == (1, 4, 10, 1)

    with pytest.raises(ValueError):
        model.generate_long(params, jax.random.PRNGKey(1), toks,
                            duration_frames=28, overlap_frames=seg)


def test_generate_long_crossfade_blends_to_constant(rng, monkeypatch):
    """If every segment decodes to the same constant, the stitched output is
    that constant everywhere (overlap weights sum to 1)."""
    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(0), mel_shape=(1, 4, 16, 1))
    toks = jnp.asarray(model.text_to_tokens(["a test"])["token"][:, :12])

    def const_generate(params, key, cond_tokens, **kw):
        return jnp.full((cond_tokens.shape[0], 4, 16, 1), 0.5)

    monkeypatch.setattr(model, "generate", const_generate)
    out = model.generate_long(params, jax.random.PRNGKey(1), toks,
                              duration_frames=40, overlap_frames=6)
    assert out.shape == (1, 4, 40, 1)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_generate_long_crossfade_large_overlap(rng, monkeypatch):
    """overlap > seg/2 (3+ segments cover a frame): weights still blend to
    unity — regression for the .set()-overwrite bug where summed weights
    reached ~2x in the mid-segment band."""
    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(0), mel_shape=(1, 4, 16, 1))
    toks = jnp.asarray(model.text_to_tokens(["a test"])["token"][:, :12])

    def const_generate(params, key, cond_tokens, **kw):
        return jnp.full((cond_tokens.shape[0], 4, 16, 1), 0.5)

    monkeypatch.setattr(model, "generate", const_generate)
    # seg=16, overlap=12 > seg/2 -> hop=4, frames covered by up to 4 segments
    out = model.generate_long(params, jax.random.PRNGKey(1), toks,
                              duration_frames=40, overlap_frames=12)
    assert out.shape == (1, 4, 40, 1)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)

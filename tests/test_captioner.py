"""ACT captioner + caption-metric tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.evaluation import caption_metrics as CM
from text_to_sound_synthesis_tpu.models.captioner import (
    ACTCaptioner,
    beam_decode,
    greedy_decode,
)

TINY = dict(ntoken=20, nhid=16, nhead=2, nlayers=1, dim_feedforward=32,
            encoder_num_classes=12, encoder_depth=1, max_len=6, sos_id=0, eos_id=9)


@pytest.fixture(scope="module")
def tiny_act():
    model = ACTCaptioner(**TINY)
    mel = jnp.zeros((1, 16, 80))
    tgt = jnp.zeros((1, 4), jnp.int32)
    # shrink the encoder via dataclass replace? fields already tiny except dims
    params = model.init(jax.random.PRNGKey(0), mel, tgt)
    return model, params


def test_act_forward_shapes(tiny_act, rng):
    model, params = tiny_act
    mel = jnp.asarray(rng.standard_normal((2, 16, 80)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, 20, (2, 5)), jnp.int32)
    logits = model.apply(params, mel, tgt)
    assert logits.shape == (2, 5, 20)


def test_act_decoder_causality(tiny_act, rng):
    model, params = tiny_act
    mel = jnp.asarray(rng.standard_normal((1, 16, 80)).astype(np.float32))
    memory = model.apply(params, mel, method=model.encode)
    tgt = jnp.asarray(rng.integers(0, 20, (1, 5)), jnp.int32)
    out1 = model.apply(params, memory, tgt, method=model.decode)
    tgt2 = np.asarray(tgt).copy()
    tgt2[:, 4] = (tgt2[:, 4] + 1) % 20
    out2 = model.apply(params, memory, jnp.asarray(tgt2), method=model.decode)
    np.testing.assert_allclose(np.asarray(out1)[:, :4], np.asarray(out2)[:, :4], atol=1e-5)


def test_greedy_and_beam_decode(tiny_act, rng):
    model, params = tiny_act
    mel = jnp.asarray(rng.standard_normal((2, 16, 80)).astype(np.float32))
    toks = greedy_decode(model, params, mel)
    assert toks.shape[0] == 2 and toks.shape[1] <= 6
    assert (toks[:, 0] == 0).all()
    beams = beam_decode(model, params, mel, beam_size=2)
    assert len(beams) == 2
    assert all(b[0] == 0 for b in beams)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_bleu_perfect_and_zero():
    cand = [CM.tokenize_caption("a dog barks in the rain")]
    refs = [[CM.tokenize_caption("a dog barks in the rain")]]
    b = CM.bleu(cand, refs)
    assert all(x == pytest.approx(1.0) for x in b)
    refs2 = [[CM.tokenize_caption("completely different words entirely here now")]]
    b2 = CM.bleu(cand, refs2)
    assert b2[0] < 0.01


def test_rouge_l_and_meteor():
    cand = [CM.tokenize_caption("a dog barks loudly")]
    refs = [[CM.tokenize_caption("a dog barks loudly")]]
    assert CM.rouge_l(cand, refs) == pytest.approx(1.0)
    assert CM.meteor_lite(cand, refs) == pytest.approx(1.0 * (1 - 0.5 * (1 / 4) ** 3), rel=1e-6)


def test_cider_orders_similarity():
    refs = [["a dog barks in the rain", "dog barking during rain"],
            ["a car engine revs", "an engine revving loudly"]]
    refs_tok = [[CM.tokenize_caption(r) for r in rs] for rs in refs]
    good = [CM.tokenize_caption("a dog barks in the rain"),
            CM.tokenize_caption("a car engine revs")]
    bad = [CM.tokenize_caption("silence and nothing"),
           CM.tokenize_caption("birds chirping softly")]
    assert CM.cider_d(good, refs_tok) > CM.cider_d(bad, refs_tok)


def test_caption_scores_keys():
    out = CM.caption_scores(["a dog barks"], [["a dog barks", "dog barking"]])
    for k in ("bleu_1", "bleu_4", "rouge_l", "cider", "meteor_lite", "spider_cider_only"):
        assert k in out and np.isfinite(out[k])
    out2 = CM.caption_scores(["a dog barks"], [["a dog barks"]], spice_scores=[0.5])
    assert "spider" in out2

"""Classifier engine tests: weighted CE, metrics math, train-step smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from text_to_sound_synthesis_tpu.engine.classifier_solver import (
    ClassifierTrainState,
    classification_metrics,
    make_classifier_train_step,
    weighted_cross_entropy,
)


def test_weighted_ce_matches_torch_convention(rng):
    torch = pytest.importorskip("torch")
    logits = rng.standard_normal((10, 5)).astype(np.float32)
    targets = rng.integers(0, 5, 10)
    weights = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    got = float(weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                                       jnp.asarray(weights)))
    want = float(torch.nn.CrossEntropyLoss(weight=torch.from_numpy(weights))(
        torch.from_numpy(logits), torch.from_numpy(targets)))
    assert got == pytest.approx(want, rel=1e-5)


def test_classification_metrics_perfect(rng):
    targets = rng.integers(0, 4, 100)
    logits = np.full((100, 4), -10.0)
    logits[np.arange(100), targets] = 10.0
    m = classification_metrics(targets, logits, topk=(1, 2))
    assert m["accuracy_1"] == 1.0
    assert m["accuracy_2"] == 1.0
    assert m["mAP"] == pytest.approx(1.0)
    assert m["mROCAUC"] == pytest.approx(1.0)


def test_classification_metrics_chance(rng):
    targets = rng.integers(0, 4, 2000)
    logits = rng.standard_normal((2000, 4))
    m = classification_metrics(targets, logits)
    assert m["accuracy_1"] == pytest.approx(0.25, abs=0.05)
    assert m["mROCAUC"] == pytest.approx(0.5, abs=0.05)


def test_classifier_train_step_learns(rng):
    from text_to_sound_synthesis_tpu.models.lpaps import VGGishish

    model = VGGishish(num_classes=3, conv_layers=(8, "MP", 16))

    class Wrap:
        def apply(self, v, mel, **kw):
            return model.apply(v, mel, **kw)

    mel = rng.standard_normal((8, 16, 24)).astype(np.float32)
    target = np.arange(8) % 3
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(mel))
    tx = optax.adam(1e-3)
    step = make_classifier_train_step(Wrap(), tx, donate=False)
    state = ClassifierTrainState.create(variables, tx)
    losses = []
    for _ in range(20):
        state, m = step(state, jnp.asarray(mel), jnp.asarray(target))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

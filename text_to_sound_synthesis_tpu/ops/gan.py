"""GAN loss primitives shared by Stage-1 (SpecVQGAN) and vocoder training.

Parity targets: ``hinge_d_loss``/``vanilla_d_loss``/``adopt_weight``
(``Codebook/specvqgan/modules/losses/vqperceptual.py:19-36``) and the MelGAN
hinge + feature-matching objective (``Diffsound/vocoder/scripts/train.py:147-176``).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["hinge_d_loss", "vanilla_d_loss", "hinge_g_loss", "adopt_weight",
           "feature_matching_l1"]


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    loss_real = jnp.mean(jnp.maximum(0.0, 1.0 - logits_real))
    loss_fake = jnp.mean(jnp.maximum(0.0, 1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (
        jnp.mean(jnp.logaddexp(0.0, -logits_real))
        + jnp.mean(jnp.logaddexp(0.0, logits_fake))
    )


def hinge_g_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    """Generator objective: -E[D(fake)] (non-saturating hinge form used by both
    the VQGAN generator pass and MelGAN)."""
    return -jnp.mean(logits_fake)


def adopt_weight(weight: float, global_step, threshold: int = 0, value: float = 0.0):
    """weight if step >= threshold else value (traced-step safe)."""
    return jnp.where(global_step < threshold, value, weight)


def feature_matching_l1(feats_real, feats_fake) -> jnp.ndarray:
    """Mean L1 across all discriminator feature maps except the final logits
    (MelGAN train.py:167-176: weight 4/n_layers_D applied per map)."""
    total = 0.0
    count = 0
    for fr, ff in zip(feats_real, feats_fake):
        for r, f in zip(fr[:-1], ff[:-1]):
            total = total + jnp.mean(jnp.abs(f - jnp.asarray(r)))
            count += 1
    return total / max(count, 1)

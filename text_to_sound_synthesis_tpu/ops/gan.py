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
    """Reference-weighted feature-matching L1 (MelGAN train.py:167-176):
    per-map weight = (4 / (n_layers_D + 1)) * (1 / num_D), summed over all
    discriminator feature maps except each scale's final logits. The weights
    are derived from the feature structure itself — each scale returns
    n_layers_D + 3 tensors (stem + n_layers downsamplers + pre-logit conv +
    logits), so 4 / (len(scale) - 2) == 4 / (n_layers_D + 1) — which keeps
    this helper numerically identical to the reference loop (and to
    ``engine/vocoder_solver.py``'s step, which shares it) at any
    discriminator geometry."""
    num_D = max(len(feats_fake), 1)
    total = 0.0
    for fr, ff in zip(feats_real, feats_fake):
        wt = (4.0 / max(len(ff) - 2, 1)) * (1.0 / num_D)
        for r, f in zip(fr[:-1], ff[:-1]):
            total = total + wt * jnp.mean(jnp.abs(f - jnp.asarray(r)))
    return total

"""MelGAN vocoder training: hinge GAN + feature matching, fused train step.

Parity target: ``Diffsound/vocoder/scripts/train.py:120-180``: per batch,
(1) discriminator hinge loss summed over 3 scales on real vs detached fake,
(2) generator loss = -sum_scale E[D(fake)] + lambda_feat (10.0) * weighted L1
feature matching (weight 4/(n_layers+1) * 1/num_D per map); Adam(1e-4, 0.5, 0.9)
for both.

Mel convention: this fork trains the vocoder on the CANONICAL [0,1]-normalized
spec (``mel2wav/utils.py:17-28`` routes through ``TRANSFORMS``, NOT the
log10-mel ``Audio2Mel``), trimmed to len//hop frames — and inference feeds the
generated [0,1] spec straight to the generator (generate_samples_batch.py:185).

Reference order preserved: D updates on the CURRENT generator's output, then G
updates against the JUST-UPDATED discriminator.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct
import optax

from ..models.melgan import MelGANDiscriminator, MelGANGenerator
from ..ops.gan import feature_matching_l1
from ..ops.signal import wav_to_mel

__all__ = ["VocoderTrainState", "make_vocoder_train_step", "mel_for_vocoder"]


class VocoderTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_opt: Any
    d_params: Any
    d_opt: Any

    @classmethod
    def create(cls, g_params, d_params, tx_g, tx_d):
        return cls(jnp.zeros((), jnp.int32), g_params, tx_g.init(g_params["params"]),
                   d_params, tx_d.init(d_params["params"]))


def mel_for_vocoder(wav: jnp.ndarray, hop: int = 256) -> jnp.ndarray:
    """(B, T) waveform -> (B, frames, 80) canonical [0,1] spec, trimmed to
    T//hop frames (train.py:133-135 via TRANSFORMS)."""
    mel = wav_to_mel(wav)  # (B, 80, frames) in [0, 1]
    trim = wav.shape[-1] // hop
    return jnp.swapaxes(mel[..., :trim], 1, 2)


def make_vocoder_train_step(
    gen: MelGANGenerator,
    disc: MelGANDiscriminator,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    lambda_feat: float = 10.0,
    n_layers_D: int = 4,
    num_D: int = 3,
    donate: bool = True,
) -> Callable:
    """Returns jitted ``step(state, wav) -> (state, metrics)``; wav (B, T)."""

    def step_fn(state: VocoderTrainState, wav: jnp.ndarray):
        mel = mel_for_vocoder(wav)
        x_real = wav[..., None]                                  # (B, T, 1)
        x_fake = gen.apply(state.g_params, mel)                  # (B, T, 1)
        x_fake_det = jax.lax.stop_gradient(x_fake)

        # ---- discriminator -------------------------------------------------
        def d_loss_fn(d_params):
            fake_feats = disc.apply(d_params, x_fake_det)
            real_feats = disc.apply(d_params, x_real)
            loss = 0.0
            for scale in fake_feats:
                loss = loss + jnp.mean(nn_relu(1.0 + scale[-1]))
            for scale in real_feats:
                loss = loss + jnp.mean(nn_relu(1.0 - scale[-1]))
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt = tx_d.update(d_grads["params"], state.d_opt,
                                       state.d_params["params"])
        d_params = dict(state.d_params,
                        params=optax.apply_updates(state.d_params["params"], d_updates))

        # ---- generator (vs updated discriminator) --------------------------
        # feature-matching targets are the PRE-update discriminator's real
        # activations: the reference reuses its D-phase ``D_real`` tensors in
        # the G phase after ``optD.step()`` (train.py:145,161-173), while the
        # adversarial term runs through the just-updated D
        real_feats = disc.apply(state.d_params, x_real)
        real_feats = jax.tree_util.tree_map(jax.lax.stop_gradient, real_feats)

        def g_loss_fn(g_params):
            fake = gen.apply(g_params, mel)
            fake_feats = disc.apply(d_params, fake)
            adv = 0.0
            for scale in fake_feats:
                adv = adv - jnp.mean(scale[-1])
            # shared reference-weighted FM helper (ops/gan.py): its
            # structure-derived 4/(len(scale)-2) * 1/num_D == feat_wt here
            fm = feature_matching_l1(real_feats, fake_feats)
            loss = adv + lambda_feat * fm
            return loss, (adv, fm, fake)

        (g_total, (adv, fm, fake)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        g_updates, g_opt = tx_g.update(g_grads["params"], state.g_opt,
                                       state.g_params["params"])
        g_params = dict(state.g_params,
                        params=optax.apply_updates(state.g_params["params"], g_updates))

        # mel reconstruction diagnostic (train.py:137-140)
        mel_fake = mel_for_vocoder(fake[..., 0])
        s_error = jnp.mean(jnp.abs(mel - mel_fake))

        new_state = state.replace(step=state.step + 1, g_params=g_params, g_opt=g_opt,
                                  d_params=d_params, d_opt=d_opt)
        metrics = {"loss_D": d_loss, "loss_G": adv, "loss_feat": fm,
                   "mel_reconstruction": s_error}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def nn_relu(x):
    return jnp.maximum(x, 0.0)

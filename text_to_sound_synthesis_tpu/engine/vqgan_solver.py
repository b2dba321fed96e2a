"""Stage-1 SpecVQGAN adversarial training: two-optimizer jitted train step.

Parity targets:
* ``VQModel.training_step``/``configure_optimizers`` (``Codebook/specvqgan/models/vqgan.py:88-144``):
  alternating AE/discriminator optimization (Adam betas (0.5, 0.9)), the
  discriminator pass re-encoding the batch with the just-updated AE (PL runs a
  fresh forward per optimizer);
* ``VQLPAPSWithDiscriminator`` (``vqperceptual.py:255-395``): L1 + LPAPS
  perceptual loss, hinge PatchGAN with adaptive discriminator weight
  ||grad nll|| / ||grad g|| measured at the decoder's LAST layer, clamped to
  [min,max]_adapt_weight, disc warm-started at ``disc_start``.

TPU-native: both optimizer phases fuse into ONE jitted step; the adaptive
weight's two extra backward passes are a single ``jax.vjp`` through the final
decoder conv pulled back with the two output cotangents (the reference runs two
full ``autograd.grad`` graphs).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct
import optax

from ..models.discriminator import NLayerDiscriminator
from ..models.lpaps import LPAPS
from ..models.vqgan.model import VQModel
from ..ops.gan import adopt_weight, hinge_d_loss, hinge_g_loss, vanilla_d_loss

__all__ = [
    "VQGANTrainState",
    "VQGANLossConfig",
    "make_vqgan_train_step",
    "make_vqgan_nodisc_train_step",
    "make_vqgan_segmentation_train_step",
]


class VQGANLossConfig(NamedTuple):
    """Mirrors the reference lossconfig params (audioset_codebook.yaml:19-29)."""

    disc_start: int = 60001
    codebook_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_factor: float = 1.0
    disc_weight: float = 0.8
    perceptual_weight: float = 1.0
    min_adapt_weight: float = 1.0
    max_adapt_weight: float = 1.0
    disc_loss: str = "hinge"


class VQGANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    ae_params: Any
    ae_opt: Any
    disc_vars: Any          # {'params': ..., 'batch_stats': ...}
    disc_opt: Any

    @classmethod
    def create(cls, ae_params, disc_vars, tx_ae, tx_disc):
        return cls(
            step=jnp.zeros((), jnp.int32),
            ae_params=ae_params,
            ae_opt=tx_ae.init(ae_params["params"]),
            disc_vars=disc_vars,
            disc_opt=tx_disc.init(disc_vars["params"]),
        )


def _replace_leaf(tree, path, value):
    """Functionally replace a nested dict leaf."""
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _replace_leaf(tree[path[0]], path[1:], value)}


def make_vqgan_train_step(
    codec: VQModel,
    lpaps: Optional[LPAPS],
    disc: NLayerDiscriminator,
    tx_ae: optax.GradientTransformation,
    tx_disc: optax.GradientTransformation,
    cfg: VQGANLossConfig = VQGANLossConfig(),
    donate: bool = True,
) -> Callable:
    """Returns jitted ``step(state, lpaps_params, mel, lr) -> (state, metrics)``.

    ``mel``: (B, H, W, 1) in [-1, 1]. ``lpaps_params`` frozen.
    """
    d_loss_fn = {"hinge": hinge_d_loss, "vanilla": vanilla_d_loss}[cfg.disc_loss]
    LAST = ("params", "decoder", "conv_out", "kernel")

    def nll_of(mel, xrec, lpaps_params):
        rec = jnp.mean(jnp.abs(mel - xrec)) * cfg.pixelloss_weight
        if lpaps is not None and cfg.perceptual_weight > 0:
            p = jnp.mean(lpaps.apply(lpaps_params, mel, xrec))
            return rec + cfg.perceptual_weight * p, p
        return rec, jnp.zeros(())

    def step_fn(state: VQGANTrainState, lpaps_params, mel, lr):
        step = state.step
        disc_factor = adopt_weight(cfg.disc_factor, step, cfg.disc_start)

        def disc_logits(dvars, r):
            # generator-phase D forward uses BATCH statistics like the
            # reference (its module is in train mode for every forward,
            # vqperceptual.py); the running-average updates are discarded —
            # the D phase below is the stats bookkeeper
            out, _ = disc.apply(dvars, r, train=True, mutable=["batch_stats"])
            return out

        # ---- adaptive disc weight at the decoder's last layer --------------
        if cfg.min_adapt_weight == cfg.max_adapt_weight:
            # clamp(x, c, c) == c: skip the extra codec forward + LPAPS and
            # disc gradients entirely (the production audioset config pins
            # the weight to 1.0; math is identical to the reference's
            # clamped calculate_adaptive_weight)
            d_weight = jnp.float32(cfg.min_adapt_weight * cfg.disc_weight)
        else:
            w_last = state.ae_params["params"]["decoder"]["conv_out"]["kernel"]

            def rec_from_w(w):
                p2 = _replace_leaf(state.ae_params, LAST, w)
                xrec, _ = codec.apply(p2, mel)
                return xrec

            xrec0, pullback = jax.vjp(rec_from_w, w_last)
            dnll_drec = jax.grad(lambda r: nll_of(mel, r, lpaps_params)[0])(xrec0)
            dg_drec = jax.grad(
                lambda r: hinge_g_loss(disc_logits(state.disc_vars, r))
            )(xrec0)
            nll_g = pullback(dnll_drec)[0]
            g_g = pullback(dg_drec)[0]
            d_weight = jnp.linalg.norm(nll_g.ravel()) / (jnp.linalg.norm(g_g.ravel()) + 1e-4)
            d_weight = jnp.clip(d_weight, cfg.min_adapt_weight, cfg.max_adapt_weight)
            d_weight = jax.lax.stop_gradient(d_weight * cfg.disc_weight)

        # ---- AE phase ------------------------------------------------------
        def ae_loss_fn(ae_params):
            xrec, vq = codec.apply(ae_params, mel)
            nll, p_loss = nll_of(mel, xrec, lpaps_params)
            logits_fake = disc_logits(state.disc_vars, xrec)
            g_loss = hinge_g_loss(logits_fake)
            loss = nll + d_weight * disc_factor * g_loss + cfg.codebook_weight * vq.loss
            aux = {"nll_loss": nll, "p_loss": p_loss, "g_loss": g_loss,
                   "quant_loss": vq.loss, "perplexity": vq.perplexity,
                   "indices": vq.indices}
            return loss, aux

        (ae_loss, aux), ae_grads = jax.value_and_grad(ae_loss_fn, has_aux=True)(state.ae_params)
        ae_updates, ae_opt = tx_ae.update(ae_grads["params"], _set_lr(state.ae_opt, lr),
                                          state.ae_params["params"])
        ae_params = dict(state.ae_params,
                         params=optax.apply_updates(state.ae_params["params"], ae_updates))

        # ---- discriminator phase (fresh forward with updated AE) -----------
        xrec_new, _ = codec.apply(ae_params, mel)
        xrec_new = jax.lax.stop_gradient(xrec_new)

        def disc_loss_fn(disc_params):
            dvars = dict(state.disc_vars, params=disc_params)
            logits_real, mut1 = disc.apply(dvars, mel, train=True, mutable=["batch_stats"])
            dvars2 = {**dvars, **mut1}
            logits_fake, mut2 = disc.apply(dvars2, xrec_new, train=True, mutable=["batch_stats"])
            d_loss = disc_factor * d_loss_fn(logits_real, logits_fake)
            return d_loss, (mut2, logits_real, logits_fake)

        (d_loss, (mut, logits_real, logits_fake)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.disc_vars["params"])
        d_updates, disc_opt = tx_disc.update(d_grads, _set_lr(state.disc_opt, lr),
                                             state.disc_vars["params"])
        disc_vars = {**state.disc_vars,
                     "params": optax.apply_updates(state.disc_vars["params"], d_updates),
                     **mut}

        new_state = state.replace(step=step + 1, ae_params=ae_params, ae_opt=ae_opt,
                                  disc_vars=disc_vars, disc_opt=disc_opt)
        metrics = {
            "total_loss": ae_loss, "nll_loss": aux["nll_loss"], "p_loss": aux["p_loss"],
            "g_loss": aux["g_loss"], "quant_loss": aux["quant_loss"],
            "perplexity": aux["perplexity"], "d_weight": d_weight,
            "disc_factor": disc_factor, "disc_loss": d_loss,
            "logits_real": jnp.mean(logits_real), "logits_fake": jnp.mean(logits_fake),
            "indices": aux["indices"],
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def _make_ae_only_train_step(loss_fn_builder, tx_ae, donate: bool) -> Callable:
    """Shared single-optimizer (AE-only) step plumbing."""

    def step_fn(state: VQGANTrainState, lpaps_params, mel, lr):
        loss_fn = loss_fn_builder(lpaps_params, mel)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.ae_params)
        updates, ae_opt = tx_ae.update(grads["params"], _set_lr(state.ae_opt, lr),
                                       state.ae_params["params"])
        ae_params = dict(state.ae_params,
                         params=optax.apply_updates(state.ae_params["params"], updates))
        new_state = state.replace(step=state.step + 1, ae_params=ae_params, ae_opt=ae_opt)
        return new_state, {"total_loss": loss, **aux}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_vqgan_nodisc_train_step(
    codec: VQModel,
    lpaps: Optional[LPAPS],
    tx_ae: optax.GradientTransformation,
    cfg: VQGANLossConfig = VQGANLossConfig(),
    donate: bool = True,
) -> Callable:
    """AE-only training (``VQNoDiscModel.training_step``, vqgan.py:302-312):
    L1 (+ optional LPAPS) + codebook loss, single Adam optimizer. The
    ``VQGANTrainState`` disc fields carry empty trees.
    """

    def builder(lpaps_params, mel):
        def loss_fn(ae_params):
            xrec, vq = codec.apply(ae_params, mel)
            rec = jnp.mean(jnp.abs(mel - xrec)) * cfg.pixelloss_weight
            p_loss = jnp.zeros(())
            if lpaps is not None and cfg.perceptual_weight > 0:
                p_loss = jnp.mean(lpaps.apply(lpaps_params, mel, xrec))
            nll = rec + cfg.perceptual_weight * p_loss
            loss = nll + cfg.codebook_weight * vq.loss
            return loss, {"nll_loss": nll, "p_loss": p_loss, "quant_loss": vq.loss,
                          "perplexity": vq.perplexity, "indices": vq.indices}
        return loss_fn

    return _make_ae_only_train_step(builder, tx_ae, donate)


def make_vqgan_segmentation_train_step(
    codec: VQModel,
    tx_ae: optax.GradientTransformation,
    cfg: VQGANLossConfig = VQGANLossConfig(),
    donate: bool = True,
) -> Callable:
    """Segmentation training (``VQSegmentationModel.training_step``,
    vqgan.py:248-253 with taming's BCE-with-quant loss): pixel-wise
    binary-cross-entropy of the decoder's label logits against the one-hot
    input map + codebook loss; AE optimizer only.

    ``mel`` argument carries the (B, H, W, n_labels) one-hot segmentation map.
    The ``lpaps_params`` slot is accepted-and-ignored so all AE-only steps
    share a call signature.
    """

    def builder(_lpaps_params, target):
        def loss_fn(ae_params):
            logits, vq = codec.apply(ae_params, target)
            bce = jnp.mean(
                optax.sigmoid_binary_cross_entropy(logits.astype(jnp.float32),
                                                   target.astype(jnp.float32)))
            loss = bce + cfg.codebook_weight * vq.loss
            return loss, {"nll_loss": bce, "quant_loss": vq.loss,
                          "perplexity": vq.perplexity, "indices": vq.indices}
        return loss_fn

    return _make_ae_only_train_step(builder, tx_ae, donate)


def _set_lr(opt_state, lr):
    if hasattr(opt_state, "hyperparams"):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def build_gan_optimizer(lr: float, betas=(0.5, 0.9)) -> optax.GradientTransformation:
    """Adam(0.5, 0.9) — vqgan.py:133-144 (both AE and discriminator)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=betas[0], b2=betas[1])

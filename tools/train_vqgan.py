#!/usr/bin/env python
"""Stage-1 SpecVQGAN training CLI.

Parity target: ``Codebook/train.py`` (``-b/--base config.yaml -t True``):
config-driven VQ-GAN training with the adversarial two-optimizer step. The
PyTorch-Lightning machinery (DDP spawn, callbacks) maps to the SPMD train step
+ the same checkpoint/lr-scaling semantics (lr = accum x ndev x bs x base_lr,
train.py:771-782).

Usage:
  python tools/train_vqgan.py --base configs/vqgan_audioset.yaml \
      --output OUTPUT --name codebook [--max_steps N] [--lpaps lin_vgg.pth]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", required=True, help="model/data config yaml")
    p.add_argument("--output", default="OUTPUT")
    p.add_argument("--name", default="vqgan")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--lpaps", default=None,
                   help="released lin_vgg.pth + vggishish ckpt dir for the perceptual loss")
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--val_every_epochs", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.data.loader import build_dataloader
    from text_to_sound_synthesis_tpu.engine.logger import Logger
    from text_to_sound_synthesis_tpu.engine.vqgan_solver import (
        VQGANLossConfig,
        VQGANTrainState,
        build_gan_optimizer,
        make_vqgan_train_step,
    )
    from text_to_sound_synthesis_tpu.engine.checkpoint import (
        save_checkpoint, wait_for_checkpoints)
    from text_to_sound_synthesis_tpu.models.discriminator import NLayerDiscriminator
    from text_to_sound_synthesis_tpu.models.lpaps import LPAPS
    from text_to_sound_synthesis_tpu.models.vqgan import VQModel
    from text_to_sound_synthesis_tpu.parallel.mesh import make_data_mesh_for_batch, shard_batch
    from text_to_sound_synthesis_tpu.utils.config import (
        load_yaml_config,
        merge_opts_to_config,
    )

    config = load_yaml_config(args.base)
    config = merge_opts_to_config(config, args.opts)
    logger = Logger(args.output, args.name)
    logger.save_config(config)

    mp = config["model"]["params"]
    codec = VQModel(ddconfig=mp["ddconfig"], n_embed=mp["n_embed"],
                    embed_dim=mp["embed_dim"])
    loss_p = dict((mp.get("lossconfig") or {}).get("params") or {})
    cfg = VQGANLossConfig(
        disc_start=loss_p.get("disc_start", 60001),
        codebook_weight=loss_p.get("codebook_weight", 1.0),
        disc_weight=loss_p.get("disc_weight", 0.8),
        perceptual_weight=loss_p.get("perceptual_weight", 1.0 if args.lpaps else 0.0),
        min_adapt_weight=loss_p.get("min_adapt_weight", 1.0),
        max_adapt_weight=loss_p.get("max_adapt_weight", 1.0),
    )
    disc = NLayerDiscriminator(input_nc=loss_p.get("disc_in_channels", 1),
                               n_layers=loss_p.get("disc_num_layers", 3),
                               ndf=loss_p.get("disc_ndf", 64),
                               use_actnorm=loss_p.get("use_actnorm", False))

    mel0 = jnp.zeros((1, 80, mp["ddconfig"]["resolution"], 1))
    ae_params = codec.init(jax.random.PRNGKey(args.seed), mel0)
    disc_vars = disc.init(jax.random.PRNGKey(args.seed + 1), mel0)

    lpaps = lpaps_params = None
    if args.lpaps and cfg.perceptual_weight > 0:
        from text_to_sound_synthesis_tpu.convert.torch_to_jax import convert_lpaps

        lpaps = LPAPS()
        lpaps_params = lpaps.init(jax.random.PRNGKey(2), mel0, mel0)
        lpaps_params = convert_lpaps(args.lpaps, lpaps_params)
        lpaps_params = jax.tree_util.tree_map(jnp.asarray, lpaps_params)

    # lr = accumulate_grad_batches * n_devices * batch_size * base_lr
    base_lr = float(config["model"].get("base_learning_rate", 1e-6))
    bs = int(config.get("data", {}).get("params", {}).get("batch_size",
             config.get("dataloader", {}).get("batch_size", 8)))
    lr = jax.device_count() * bs * base_lr
    logger.log_info(f"lr = {jax.device_count()} x {bs} x {base_lr} = {lr:.2e}")

    tx_ae, tx_disc = build_gan_optimizer(lr), build_gan_optimizer(lr)
    step = make_vqgan_train_step(codec, lpaps, disc, tx_ae, tx_disc, cfg)
    state = VQGANTrainState.create(ae_params, disc_vars, tx_ae, tx_disc)

    mesh = make_data_mesh_for_batch(bs)
    dataloader = build_dataloader(config, seed=args.seed)
    train_loader = dataloader["train_loader"]
    max_steps = args.max_steps or 10**9

    epoch = 0
    if args.auto_resume:
        from text_to_sound_synthesis_tpu.engine.checkpoint import (
            latest_checkpoint,
            restore_checkpoint,
        )

        name = latest_checkpoint(logger.ckpt_dir)
        if name:
            payload, host = restore_checkpoint(
                logger.ckpt_dir, name, {"state": state})
            state = jax.tree_util.tree_map(jnp.asarray, payload["state"])
            epoch = int((host or {}).get("epoch", 0))
            logger.log_info(f"resumed {name!r} at epoch {epoch}, "
                            f"iter {int(jax.device_get(state.step))}")

    fwd = jax.jit(lambda p, x: codec.apply(p, x))  # shared across val epochs

    def validate(epoch):
        vloader = dataloader.get("validation_loader")
        if vloader is None:
            return
        recon_l1, all_idx = [], []
        for batch in vloader:
            v = np.asarray(batch["image"], np.float32)
            if v.ndim == 3:
                v = v[..., None]
            elif v.shape[1] == 1:
                v = np.transpose(v, (0, 2, 3, 1))
            xrec, vq = fwd(state.ae_params, jnp.asarray(v))
            recon_l1.append(float(jnp.mean(jnp.abs(jnp.asarray(v) - xrec))))
            all_idx.append(np.asarray(vq.indices).ravel())
        if recon_l1:
            usage = len(np.unique(np.concatenate(all_idx)))
            logger.log_info(f"val epoch {epoch}: recon_l1 {np.mean(recon_l1):.5f} "
                            f"codebook usage {usage}/{mp['n_embed']}")
            it = int(jax.device_get(state.step))
            logger.add_scalar("val/recon_l1", float(np.mean(recon_l1)), it)
            logger.add_scalar("val/codebook_usage", usage, it)

    done = False
    while not done:
        for batch in train_loader:
            mel = np.asarray(batch["image"], np.float32)
            if mel.ndim == 3:
                mel = mel[..., None]
            elif mel.shape[1] == 1:
                mel = np.transpose(mel, (0, 2, 3, 1))
            mel = shard_batch({"x": mel}, mesh)["x"]
            state, metrics = step(state, lpaps_params, mel, lr)
            it = int(jax.device_get(state.step))
            if it % 100 == 0:
                # codebook-usage diagnostic (vqgan.py:110-118 histogram analogue)
                used = len(np.unique(np.asarray(metrics["indices"])))
                logger.log_info(
                    f"e{epoch} it{it} total {float(metrics['total_loss']):.4f} "
                    f"nll {float(metrics['nll_loss']):.4f} perp {float(metrics['perplexity']):.1f} "
                    f"d {float(metrics['disc_loss']):.4f} codes_used {used}/{mp['n_embed']}"
                )
                for k in ("total_loss", "nll_loss", "quant_loss", "perplexity", "disc_loss"):
                    logger.add_scalar(f"train/{k}", float(metrics[k]), it)
            if it >= max_steps:
                done = True
                break
        epoch += 1
        it = int(jax.device_get(state.step))
        # async ping-pong slots: never delete the newest committed checkpoint
        # while its replacement is still in flight (engine/checkpoint.py
        # durability contract); last_iter orders the slots on resume
        save_checkpoint(logger.ckpt_dir,
                        "auto_a" if epoch % 2 == 0 else "auto_b",
                        {"state": state},
                        {"epoch": epoch, "step": it, "last_iter": it},
                        async_save=True)
        if epoch % args.val_every_epochs == 0:
            validate(epoch)
    wait_for_checkpoints()
    it = int(jax.device_get(state.step))
    save_checkpoint(logger.ckpt_dir, "last", {"state": state},
                    {"epoch": epoch, "step": it, "last_iter": it})
    logger.log_info("training done")


if __name__ == "__main__":
    main()

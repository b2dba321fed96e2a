#!/usr/bin/env python
"""AR-baseline (Net2Net GPT) training CLI.

Parity target: the Stage-1 Lightning stack driving
``Net2NetTransformer.shared_step`` (``Codebook/specvqgan/models/cond_transformer.py:353``)
with ``caps_transformer.yaml``: frozen VQ codec, next-token cross entropy,
AdamW with the minGPT decay/no-decay split, lr = ndev x bs x base_lr.

Usage:
  python tools/train_ar.py --base configs/ar_audiocaps.yaml --output OUTPUT \
      [--codec converted/vqgan] [--max_steps N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", required=True)
    p.add_argument("--output", default="OUTPUT")
    p.add_argument("--name", default="ar_gpt")
    p.add_argument("--codec", default=None, help="converted VQModel orbax tree")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from text_to_sound_synthesis_tpu.data.loader import build_dataloader
    from text_to_sound_synthesis_tpu.engine.checkpoint import save_checkpoint
    from text_to_sound_synthesis_tpu.engine.logger import Logger
    from text_to_sound_synthesis_tpu.engine.optimizers import decay_mask
    from text_to_sound_synthesis_tpu.models.gpt import Net2NetTransformer
    from text_to_sound_synthesis_tpu.parallel.mesh import make_data_mesh_for_batch, shard_batch
    from text_to_sound_synthesis_tpu.utils.config import (
        instantiate_from_config,
        load_yaml_config,
        merge_opts_to_config,
    )

    config = merge_opts_to_config(load_yaml_config(args.base), args.opts)
    logger = Logger(args.output, args.name)
    logger.save_config(config)

    model: Net2NetTransformer = instantiate_from_config(config["model"])
    ccfg = config["model"]["params"]["transformer_config"]["params"]
    cond_dim = ccfg["feat_embedding_config"]["params"]["in_channels"]
    params = model.init_params(jax.random.PRNGKey(args.seed),
                               cond_shape=(1, cond_dim, 1))
    if args.codec:
        import orbax.checkpoint as ocp

        codec_params = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.codec), item=jax.device_get(params["codec"]))
        params["codec"] = jax.tree_util.tree_map(jnp.asarray, codec_params)

    bs = int(config["dataloader"]["batch_size"])
    base_lr = float(config["model"].get("base_learning_rate", 1e-6))
    lr = jax.device_count() * bs * base_lr
    tx = optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=0.01, mask=decay_mask)
    opt_state = tx.init(params["gpt"]["params"])
    mesh = make_data_mesh_for_batch(bs)

    @jax.jit
    def step(gpt_params, opt_state, codec_params, mel, cond):
        def loss_fn(gp):
            loss, _ = model.loss({"codec": codec_params, "gpt": gp}, mel, cond)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(gpt_params)
        updates, opt_state2 = tx.update(grads["params"], opt_state,
                                        gpt_params["params"])
        new = dict(gpt_params, params=optax.apply_updates(gpt_params["params"], updates))
        return new, opt_state2, loss

    dataloader = build_dataloader(config, seed=args.seed)
    loader = dataloader["train_loader"]
    max_steps = args.max_steps or 10**9
    it = 0
    epoch = 0
    gpt_params = params["gpt"]
    while it < max_steps:
        for batch in loader:
            mel = np.asarray(batch["image"], np.float32)
            if mel.ndim == 3:
                mel = mel[..., None]
            elif mel.shape[1] == 1:
                mel = np.transpose(mel, (0, 2, 3, 1))
            b = shard_batch({"mel": mel, "cond": np.asarray(batch["feature"], np.float32)}, mesh)
            gpt_params, opt_state, loss = step(gpt_params, opt_state,
                                               params["codec"], b["mel"], b["cond"])
            it += 1
            if it % 100 == 0:
                logger.log_info(f"e{epoch} it{it} ce_loss {float(loss):.4f}")
                logger.add_scalar("train/loss", float(loss), it)
            if it >= max_steps:
                break
        epoch += 1
        save_checkpoint(logger.ckpt_dir, "last",
                        {"codec": params["codec"], "gpt": gpt_params},
                        {"epoch": epoch, "step": it})
    logger.log_info("done")


if __name__ == "__main__":
    main()

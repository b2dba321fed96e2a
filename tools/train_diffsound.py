#!/usr/bin/env python
"""Stage-2 Diffsound training CLI.

Parity target: ``Diffsound/train_spec.py`` (same flags: --config_file, --name,
--output, --load_path, --auto_resume, --seed, --debug, trailing opts). The DDP
launcher plumbing (``--num_node/--gpu/DIST_URL``) is replaced by SPMD-on-mesh:
single host uses every local device automatically; multi-host bring-up is
``jax.distributed.initialize()`` driven by standard JAX env vars.

Usage:
  python tools/train_diffsound.py --config_file configs/diffsound_audiocaps.yaml \
      --name run1 --output OUTPUT [--load_path conv.pth] [--auto_resume] [opts ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args():
    p = argparse.ArgumentParser(description="TPU-native Diffsound training")
    p.add_argument("--config_file", type=str, required=True)
    p.add_argument("--name", type=str, default="diffsound")
    p.add_argument("--output", type=str, default="OUTPUT")
    p.add_argument("--load_path", type=str, default=None,
                   help="released torch .pth to convert and warm-start from")
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--resume_name", type=str, default=None)
    p.add_argument("--seed", type=int, default=seed_default())
    p.add_argument("--debug", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before device use")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="dotlist config overrides: key value [key value ...]")
    return p.parse_args()


def seed_default():
    return 0


def main():
    args = get_args()
    if args.multihost:
        import jax

        jax.distributed.initialize()

    from text_to_sound_synthesis_tpu.data.loader import build_dataloader
    from text_to_sound_synthesis_tpu.engine.logger import Logger
    from text_to_sound_synthesis_tpu.engine.solver import Solver
    from text_to_sound_synthesis_tpu.models.diffsound import build_model
    from text_to_sound_synthesis_tpu.utils.config import (
        load_yaml_config,
        merge_opts_to_config,
        modify_config_for_debug,
    )

    config = load_yaml_config(args.config_file)
    config = merge_opts_to_config(config, args.opts)
    if args.debug:
        config = modify_config_for_debug(config)

    logger = Logger(args.output, args.name)
    logger.save_config(config)
    logger.log_info(f"building model from {args.config_file}")

    model = build_model(config)
    dataloader = build_dataloader(config, seed=args.seed)

    params = None
    if args.load_path:
        import jax

        from text_to_sound_synthesis_tpu.convert.torch_to_jax import (
            convert_diffsound_checkpoint,
        )

        # --load_path supplies the full tree (codec included) — skip the
        # config's stage-1 codec restore in the throwaway template
        template = model.init_params(jax.random.PRNGKey(args.seed),
                                     load_codec=False)
        logger.log_info(f"converting torch checkpoint {args.load_path}")
        params = convert_diffsound_checkpoint(args.load_path, model, template)

    solver = Solver(config, model, dataloader, logger, params=params, seed=args.seed)
    if args.auto_resume or args.resume_name:
        solver.resume(args.resume_name)
    solver.train()


if __name__ == "__main__":
    main()

"""End-to-end Solver smoke test: tiny composite + synthetic dataset, full loop
with checkpoint save + resume."""

import numpy as np
import pytest

import jax

from text_to_sound_synthesis_tpu.data.datasets import ArrayDataset
from text_to_sound_synthesis_tpu.data.loader import ShardedLoader
from text_to_sound_synthesis_tpu.engine.logger import Logger
from text_to_sound_synthesis_tpu.engine.solver import Solver
from text_to_sound_synthesis_tpu.parallel.mesh import make_mesh
from text_to_sound_synthesis_tpu.models.diffsound import build_model


@pytest.mark.slow
def test_solver_train_and_resume(tmp_path, rng):
    from tests.test_composite import TINY_MODEL_CFG, _has_bpe
    if not _has_bpe():
        pytest.skip("BPE artifact unavailable")

    model = build_model(TINY_MODEL_CFG)
    images = rng.standard_normal((8, 1, 4, 16)).astype(np.float32)
    ds = ArrayDataset(images, ["a dog barks"] * 4 + ["rain falls"] * 4)
    loader = ShardedLoader(ds, batch_size=4, seed=0, num_shards=1, shard_index=0)

    config = {
        "solver": {
            "base_lr": 1e-3, "adjust_lr": "none", "max_epochs": 2,
            "save_epochs": 1, "validation_epochs": 1, "sample_iterations": 2,
            "ema": {"decay": 0.9, "update_interval": 1},
            "clip_grad_norm": {
                "target": "text_to_sound_synthesis_tpu.engine.ClipGradNorm",
                "params": {"start_iteration": 0, "end_iteration": 100, "max_norm": 0.5},
            },
            "optimizers_and_schedulers": [{
                "name": "none",
                "optimizer": {"target": "adamw", "params": {"weight_decay": 0.01}},
                "scheduler": {
                    "step_iteration": 1,
                    "target": "text_to_sound_synthesis_tpu.engine.ReduceLROnPlateauWithWarmup",
                    "params": {"factor": 0.5, "patience": 100, "min_lr": 1e-6,
                               "warmup_lr": 2e-3, "warmup": 2},
                },
            }],
        },
        "dataloader": {"batch_size": 4},
    }

    logger = Logger(str(tmp_path), "run")
    params = model.init_params(jax.random.PRNGKey(0), mel_shape=(1, 4, 16, 1))
    dataloader = {"train_loader": loader, "train_iterations": len(loader),
                  "validation_loader": ShardedLoader(ds, batch_size=4, seed=0,
                                                     num_shards=1, shard_index=0,
                                                     shuffle=False)}
    mesh = make_mesh(jax.devices()[:1])
    solver = Solver(config, model, dataloader, logger, params=params, mesh=mesh, seed=0)
    solver.train()
    assert int(jax.device_get(solver.state.step)) == 4  # 2 epochs x 2 iters

    # samples written by the in-training sampler
    import glob, os
    assert glob.glob(os.path.join(logger.run_dir, "samples", "*.npy"))

    # fresh solver resumes from the checkpoint
    logger2 = Logger(str(tmp_path), "run")
    solver2 = Solver(config, model, dataloader, logger2, params=params, mesh=mesh, seed=0)
    assert solver2.resume()
    assert solver2.last_epoch == 1
    assert int(jax.device_get(solver2.state.step)) == 4
    # scheduler state restored
    assert solver2.scheduler.last_epoch == solver.scheduler.last_epoch

    # best-checkpoint tracking wrote top-k dirs (validation ran every epoch)
    import glob
    best = glob.glob(os.path.join(logger.ckpt_dir, "best_e*"))
    best = [b for b in best if not b.endswith(".json")]
    assert best, "no best checkpoints saved"
    assert len(best) <= solver.save_top_k

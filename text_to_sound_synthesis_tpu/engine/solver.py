"""Stage-2 training solver: epoch loop, scheduling, EMA, checkpoints, sampling.

Parity target: ``Solver`` (``Diffsound/sound_synthesis/engine/solver_spec.py:36-596``):
lr policies none/sqrt/linear, optimizer+scheduler from the config list, EMA,
windowed grad clip, per-iteration plateau scheduler stepping on the train loss,
periodic in-training sampling, epoch/iteration checkpoints with auto-resume,
validation with loss averaging, and the per-timestep accuracy EMAs
(``diffusion_acc_list``/``diffusion_keep_list``).

TPU-native: one jitted SPMD train step over the device mesh (engine/train_state.py)
— no DDP, no GradScaler (bf16 needs no loss scaling), no .cuda() shuffling.
"""

from __future__ import annotations

import math
import time
from typing import Any, Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.diffsound import Diffsound
from ..parallel.mesh import make_data_mesh_for_batch, shard_batch
from ..utils.config import instantiate_from_config
from .checkpoint import (latest_checkpoint, restore_checkpoint,
                         save_checkpoint, wait_for_checkpoints)
from .logger import Logger
from .optimizers import build_optimizer
from .train_state import DiffusionTrainState, make_train_step

__all__ = ["Solver"]


class Solver:
    def __init__(
        self,
        config: Mapping[str, Any],
        model: Diffsound,
        dataloader: Mapping[str, Any],
        logger: Logger,
        *,
        params: Optional[dict] = None,
        mesh=None,
        seed: int = 0,
    ):
        """``dataloader``: {'train_loader': iterable-of-batches factory or
        iterable, 'train_iterations': int, 'validation_loader': optional, ...}
        (matches data/build.py's output schema)."""
        self.config = dict(config)
        solver_cfg = self.config["solver"]
        self.model = model
        self.dataloader = dataloader
        self.logger = logger
        if mesh is None:
            bs0 = int(self.config.get("dataloader", {}).get("batch_size", 1))
            mesh = make_data_mesh_for_batch(bs0)
        self.mesh = mesh
        self.max_epochs = int(solver_cfg["max_epochs"])
        self.save_epochs = int(solver_cfg.get("save_epochs", 30))
        self.validation_epochs = int(solver_cfg.get("validation_epochs", 400))
        self.sample_iterations = solver_cfg.get("sample_iterations", "epoch")
        if self.sample_iterations == "epoch":
            self.sample_iterations = int(dataloader.get("train_iterations", 1))

        # lr policy (solver_spec.py:69-79)
        base_lr = float(solver_cfg.get("base_lr", 3e-6))
        adjust = solver_cfg.get("adjust_lr", "none")
        world_batch = int(self.config.get("dataloader", {}).get("batch_size", 1)) * jax.device_count()
        if adjust == "none":
            self.base_lr = base_lr
        elif adjust == "sqrt":
            self.base_lr = base_lr * math.sqrt(world_batch)
        elif adjust == "linear":
            self.base_lr = base_lr * world_batch
        else:
            raise NotImplementedError(f"adjust_lr {adjust!r}")

        # optimizer + scheduler (first entry of the config list; the reference's
        # multi-optimizer epoch gating is unused in every released config)
        oas = solver_cfg["optimizers_and_schedulers"][0]
        self.tx = build_optimizer(oas["optimizer"], self.base_lr)
        sched_cfg = oas.get("scheduler")
        if sched_cfg is not None:
            self.scheduler = instantiate_from_config(sched_cfg, base_lr=self.base_lr)
            self.scheduler_step_iteration = int(sched_cfg.get("step_iteration", 1))
        else:
            self.scheduler = None
            self.scheduler_step_iteration = 1

        clip_cfg = solver_cfg.get("clip_grad_norm")
        self.clip_grad = instantiate_from_config(clip_cfg) if clip_cfg else None

        ema_cfg = solver_cfg.get("ema") or {}
        self.ema_decay = float(ema_cfg.get("decay", 0.99))
        self.ema_interval = int(ema_cfg.get("update_interval", 25))
        with_ema = bool(ema_cfg) if ema_cfg is not None else False

        # params: full tree {'codec','cond','diffusion'}
        key = jax.random.PRNGKey(seed)
        self.rng = jax.random.PRNGKey(seed + 1)
        if params is None:
            params = model.init_params(key)
        else:
            # copy: the train step donates its state buffers; the caller's tree
            # must stay alive (e.g. to build another solver)
            params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        self.frozen = {"codec": params["codec"], "cond": params["cond"]}
        self.state = DiffusionTrainState.create(
            params["diffusion"], self.tx,
            num_timesteps=model.diffusion.diffusion_step, with_ema=with_ema,
        )

        self.train_step = make_train_step(
            model, self.tx, self.clip_grad,
            ema_decay=self.ema_decay, ema_interval=self.ema_interval,
        )

        self.last_epoch = -1
        # per-timestep accuracy EMAs (diffusion_transformer.py:221-222, 427-436)
        T = model.diffusion.diffusion_step
        self.diffusion_acc_list = [0.0] * T
        self.diffusion_keep_list = [0.0] * T

        # in-training sampling (solver_spec.py:191-261): cached caption batch
        self._sample_batch = None
        self.vocoder = None  # optionally attached for audible samples
        voc_cfg = solver_cfg.get("vocoder_path")  # ImageLogger's vocoder_cfg analogue
        if voc_cfg:
            try:
                from ..models.melgan.interface import load_vocoder

                self.vocoder = load_vocoder(voc_cfg)
            except Exception as e:
                logger.log_info(f"vocoder attach failed ({e!r}); samples stay spec-only")
        # best-checkpoint tracking (PL ModelCheckpoint top-k analogue,
        # Codebook/train.py:705-721): keep the k best validation losses
        self.save_top_k = int(solver_cfg.get("save_top_k", 3))
        self._best: list = []  # [(val_loss, name)] sorted ascending
        # profiling hook (reference has none; SURVEY.md §5 tracing gap)
        self.profile_dir = solver_cfg.get("profile_dir")
        self._profiling = False

    # -- checkpointing -------------------------------------------------------

    def save(self, epoch: int, force: bool = False) -> None:
        if not self.logger.is_primary:
            return
        it = int(jax.device_get(self.state.step))
        host = {
            "last_epoch": epoch,
            "last_iter": it,
            "scheduler": self.scheduler.state_dict() if self.scheduler else None,
            "acc_lists": [self.diffusion_acc_list, self.diffusion_keep_list],
        }
        payload = {"state": self.state, "frozen": self.frozen}
        if force:
            # melk (SIGUSR1 preemption) / end of training: the process may be
            # killed next, so the save must be DURABLE before returning —
            # async overwrite of a mutable name deletes the old copy before
            # the new one commits, exactly the window a preemption would hit.
            wait_for_checkpoints()
            save_checkpoint(self.logger.ckpt_dir, "last", payload, host)
            save_checkpoint(self.logger.ckpt_dir, f"{epoch}e_{it}iter",
                            payload, host)
        else:
            # Per-epoch saves are ASYNC into PING-PONG slots: the train loop
            # resumes immediately, the commit is atomic, and because the slot
            # being overwritten is the OLDER of the two, the newest committed
            # checkpoint is never deleted — a crash mid-write loses only the
            # in-flight save (latest_checkpoint orders slots/tags by their
            # sidecar iteration).  Epoch-tagged copies keep history.
            slot = "auto_a" if epoch % 2 == 0 else "auto_b"
            save_checkpoint(self.logger.ckpt_dir, slot, payload, host,
                            async_save=True)
            if (epoch + 1) % self.save_epochs == 0:
                save_checkpoint(self.logger.ckpt_dir, f"{epoch}e_{it}iter",
                                payload, host, async_save=True)
        self.logger.log_info(
            f"saving checkpoint at epoch {epoch}, iter {it} "
            f"({'sync' if force else 'async'})")

    def resume(self, name: Optional[str] = None) -> bool:
        wait_for_checkpoints()  # don't race an in-flight async save
        name = name or latest_checkpoint(self.logger.ckpt_dir)
        if name is None:
            return False
        template = {"state": self.state, "frozen": self.frozen}
        payload, host = restore_checkpoint(self.logger.ckpt_dir, name, template)
        self.state = jax.tree_util.tree_map(jnp.asarray, payload["state"])
        # restore as a DiffusionTrainState (orbax returns plain dicts for
        # structs saved via device_get when template preserved -> already typed)
        self.frozen = jax.tree_util.tree_map(jnp.asarray, payload["frozen"])
        if host:
            self.last_epoch = int(host.get("last_epoch", -1))
            if self.scheduler and host.get("scheduler"):
                self.scheduler.load_state_dict(host["scheduler"])
            acc = host.get("acc_lists")
            if acc:
                self.diffusion_acc_list, self.diffusion_keep_list = acc
        self.logger.log_info(f"resumed from checkpoint {name!r} (epoch {self.last_epoch})")
        return True

    # -- training ------------------------------------------------------------

    def _host_update_acc(self, t, a0, ak) -> None:
        for i in range(len(t)):
            ti = int(t[i])
            self.diffusion_acc_list[ti] = float(a0[i]) * 0.1 + self.diffusion_acc_list[ti] * 0.9
            self.diffusion_keep_list[ti] = float(ak[i]) * 0.1 + self.diffusion_keep_list[ti] * 0.9

    def sample(self, suffix: str = "") -> None:
        """Periodic in-training sampling: generate from cached captions with
        the EMA weights and dump spec .npy (+ .png, + vocoded .wav when a
        vocoder is attached) under <run>/samples (solver_spec.py:191-261)."""
        if self._sample_batch is None or not self.logger.is_primary:
            return
        import os

        import numpy as np_

        params = {
            "codec": self.frozen["codec"], "cond": self.frozen["cond"],
            "diffusion": self.state.ema_params if self.state.ema_params is not None
            else self.state.params,
        }
        self.rng, k = jax.random.split(self.rng)
        cond_tokens = jnp.asarray(self._sample_batch["condition_token"][:4])
        mel = self.model.generate(params, k, cond_tokens, sample_type="top0.85r")
        spec = (np_.asarray(mel)[..., 0] + 1.0) / 2.0
        it = int(jax.device_get(self.state.step))
        outdir = os.path.join(self.logger.run_dir, "samples")
        os.makedirs(outdir, exist_ok=True)
        for b in range(spec.shape[0]):
            base = os.path.join(outdir, f"it{it}_{b}{suffix}")
            np_.save(base + ".npy", spec[b])
            try:
                from PIL import Image

                img = (np_.clip(spec[b], 0, 1) * 255).astype("uint8")[::-1]
                Image.fromarray(img).save(base + ".png")
            except Exception:
                pass
            if self.vocoder is not None:
                from ..utils.io import write_wav

                write_wav(base + ".wav", 22050, self.vocoder(spec[b : b + 1])[0])
        self.logger.log_info(f"wrote {spec.shape[0]} samples at iter {it}")

    def _maybe_profile(self, it: int) -> None:
        if not self.profile_dir or not self.logger.is_primary:
            return
        if it == 10 and not self._profiling:
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
            self.logger.log_info(f"profiler trace started -> {self.profile_dir}")
        elif it >= 15 and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            self.logger.log_info("profiler trace stopped")

    def train_epoch(self, epoch: int, log_frequency: int = 100) -> float:
        """Hot loop with ZERO synchronous per-step host transfers.

        The reference feeds the plateau scheduler the CURRENT step's loss,
        which forces a device sync every iteration (solver_spec.py:328). Here
        each step's metrics are fetched at the START of the NEXT iteration —
        after that step has been dispatched — so the host round-trip overlaps
        device compute. The scheduler therefore sees a one-step-stale loss
        (within training noise; VERDICT.md weak #3). All scalars travel in one
        batched ``device_get``.
        """
        loader = self.dataloader["train_loader"]
        if hasattr(loader, "set_epoch"):
            # pin the shuffle/caption-draw epoch to the TRAINING epoch (the
            # DistributedSampler.set_epoch parity): without this a resumed
            # run's loader restarts at its internal epoch 0 and replays the
            # early epochs' data order
            loader.set_epoch(epoch)
        itr_start = time.time()
        last_loss = float("nan")
        host_step = int(jax.device_get(self.state.step))  # one sync per epoch
        pending = None  # (loader index, metrics still on device)

        def consume(idx, metrics):
            nonlocal last_loss
            loss, gn, t, a0, ak = jax.device_get(
                (metrics.loss, metrics.grad_norm, metrics.t,
                 metrics.acc_x0, metrics.acc_keep))
            last_loss = float(loss)
            if self.scheduler and (idx % self.scheduler_step_iteration == 0):
                self.scheduler.step(last_loss)
            self._host_update_acc(np.asarray(t), np.asarray(a0), np.asarray(ak))
            return last_loss, float(gn)

        for i, batch in enumerate(loader):
            data_time = time.time() - itr_start
            batch = self._to_model_batch(batch)
            if self._sample_batch is None:
                self._sample_batch = batch
            batch = shard_batch(batch, self.mesh)
            self.rng, step_key = jax.random.split(self.rng)
            lr = self.scheduler.lr if self.scheduler else self.base_lr
            self.state, metrics = self.train_step(self.state, self.frozen, batch, step_key, lr)
            host_step += 1
            if pending is not None:
                consume(*pending)
            pending = (i, metrics)
            self._maybe_profile(host_step)
            if self.sample_iterations and host_step % max(1, int(self.sample_iterations)) == 0:
                try:
                    self.sample()
                except Exception as e:  # sampling must never kill training
                    self.logger.log_info(f"in-training sampling failed: {e!r}")
            if i % log_frequency == 0:
                # log the current step: force-consume (one sync per log window)
                loss, gn = consume(*pending)
                pending = None
                iter_time = time.time() - itr_start
                self.logger.log_info(
                    f"e{epoch} it{host_step} loss {loss:.5f} lr {lr:.3e} gnorm {gn:.3f} "
                    f"data_time {data_time:.3f}s iter_time {iter_time:.3f}s"
                )
                self.logger.add_scalar("train/loss", loss, host_step)
                self.logger.add_scalar("train/lr", lr, host_step)
                self.logger.add_scalar("train/grad_norm", gn, host_step)
            itr_start = time.time()
        if pending is not None:
            consume(*pending)
        return last_loss

    def _to_model_batch(self, batch: Mapping[str, Any]) -> dict:
        """Dataset batches carry {'image': mel01 (B,1,H,W) or (B,H,W,1), 'text': [str]}.
        Tokenize text host-side; mels -> NHWC in [-1, 1]."""
        out = {}
        mel = np.asarray(batch[self.model.content_info["key"]], dtype=np.float32)
        if mel.ndim == 4 and mel.shape[1] in (1,):  # NCHW -> NHWC
            mel = np.transpose(mel, (0, 2, 3, 1))
        elif mel.ndim == 3:
            mel = mel[..., None]
        out[self.model.content_info["key"]] = mel
        if "condition_token" in batch:
            out["condition_token"] = np.asarray(batch["condition_token"], np.int32)
        else:
            text = batch[self.model.condition_info["key"]]
            out["condition_token"] = self.model.text_to_tokens(list(text))["token"]
        return out

    def validate_epoch(self, epoch: int) -> Optional[float]:
        loader = self.dataloader.get("validation_loader")
        if loader is None:
            return None
        losses = []
        params = {"codec": self.frozen["codec"], "cond": self.frozen["cond"],
                  "diffusion": self.state.ema_params if self.state.ema_params is not None else self.state.params}
        T = self.model.diffusion.diffusion_step
        for batch in loader:
            b = shard_batch(self._to_model_batch(batch), self.mesh)
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            B = b[self.model.content_info["key"]].shape[0]
            t = jax.random.randint(k1, (B,), 0, T)
            pt = jnp.full((B,), 1.0 / T)
            out = self.model.loss(params, k2, b[self.model.content_info["key"]],
                                  b["condition_token"], t, pt, is_train=False)
            # keep the device scalar — fetching here would sync every batch
            # (the train loop's lagged-consume treatment, VERDICT r2 #9)
            losses.append(out.loss)
        val = (float(np.mean([jax.device_get(l) for l in losses]))
               if losses else None)
        if val is not None:
            self.logger.log_info(f"validation epoch {epoch}: loss {val:.5f}")
            self.logger.add_scalar("val/loss", val, int(jax.device_get(self.state.step)))
            self._maybe_save_best(epoch, val)
        return val

    def _maybe_save_best(self, epoch: int, val_loss: float) -> None:
        """Keep the save_top_k best-by-val-loss checkpoints (PL top-k analogue)."""
        if not self.logger.is_primary or self.save_top_k <= 0:
            return
        import os
        import shutil

        if len(self._best) >= self.save_top_k and val_loss >= self._best[-1][0]:
            return
        it = int(jax.device_get(self.state.step))
        name = f"best_e{epoch}_{val_loss:.5f}"
        save_checkpoint(self.logger.ckpt_dir, name,
                        {"state": self.state, "frozen": self.frozen},
                        {"last_epoch": epoch, "last_iter": it, "val_loss": val_loss})
        self._best.append((val_loss, name))
        self._best.sort()
        while len(self._best) > self.save_top_k:
            _, evict = self._best.pop()
            path = os.path.join(self.logger.ckpt_dir, evict)
            shutil.rmtree(path, ignore_errors=True)
            for suffix in (".host.json",):
                try:
                    os.remove(path + suffix)
                except OSError:
                    pass
        self.logger.log_info(f"saved best checkpoint {name!r} "
                             f"(top-{self.save_top_k}: {[n for _, n in self._best]})")

    def train(self) -> None:
        # SIGUSR1 -> checkpoint now (the PL stack's "melk" hook, train.py:784-797)
        import signal

        def _melk(signum, frame):
            self.logger.log_info("SIGUSR1: checkpointing")
            self.save(self.last_epoch, force=True)

        try:
            signal.signal(signal.SIGUSR1, _melk)
        except (ValueError, OSError):
            pass  # non-main thread

        start_epoch = self.last_epoch + 1
        for epoch in range(start_epoch, self.max_epochs):
            t0 = time.time()
            self.train_epoch(epoch)
            self.logger.log_info(f"epoch {epoch} done in {time.time() - t0:.1f}s")
            self.last_epoch = epoch
            self.save(epoch, force=False)
            if (epoch + 1) % self.validation_epochs == 0:
                self.validate_epoch(epoch)
        self.save(self.max_epochs - 1, force=True)
        wait_for_checkpoints()

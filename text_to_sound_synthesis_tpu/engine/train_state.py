"""Train state + the jitted Stage-2 train step.

Replaces the mutable-module plumbing of the reference solver
(``solver_spec.py:263-334``: batch->cuda, forward, DDP-allreduce backward,
clip, step, EMA) with one pure function over an explicit state pytree, jitted
with mesh shardings: batch sharded on 'data', state replicated; XLA inserts the
gradient all-reduce.

Frozen components (VQ codec, CLIP text tower) are separate param trees passed
as inputs — they never enter the optimizer, which is the TPU-native answer to
the reference's ``find_unused_parameters=True`` DDP workaround (solver_spec.py:109).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct
import optax

from ..models.diffsound import Diffsound
from ..models.diffusion.process import (
    TimestepSamplerState,
    sample_timesteps,
    update_timestep_state,
)
from .clip_grad import ClipGradNorm
from .ema import ema_update

__all__ = ["DiffusionTrainState", "make_train_step", "TrainMetrics"]


class TrainMetrics(NamedTuple):
    loss: jnp.ndarray
    grad_norm: jnp.ndarray
    acc_x0: jnp.ndarray      # (B,) per-sample diagnostics
    acc_keep: jnp.ndarray    # (B,)
    t: jnp.ndarray           # (B,)


class DiffusionTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any                      # diffusion (trainable) params
    opt_state: Any
    ema_params: Any
    lt: TimestepSamplerState

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, num_timesteps: int,
               with_ema: bool = True):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params["params"] if "params" in params else params),
            # NOTE: must COPY — aliasing params would break buffer donation
            ema_params=(
                jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
                if with_ema else None
            ),
            lt=TimestepSamplerState.create(num_timesteps),
        )


def make_train_step(
    model: Diffsound,
    tx: optax.GradientTransformation,
    clip_grad: Optional[ClipGradNorm] = None,
    ema_decay: float = 0.99,
    ema_interval: int = 25,
    donate: bool = True,
) -> Callable:
    """Returns jitted ``step(state, frozen, batch, key, lr) -> (state, metrics)``.

    * ``frozen``: {'codec': ..., 'cond': ...} frozen param trees.
    * ``batch``: {'image': (B, H, W, 1) mel in [-1,1], 'condition_token': (B, S)}.
    * ``lr``: scalar learning rate from the host-side plateau scheduler.
    """
    T = model.diffusion.diffusion_step

    def step_fn(state: DiffusionTrainState, frozen, batch, key, lr):
        k_t, k_loss = jax.random.split(key)
        mel = batch[model.content_info["key"]]
        cond_tokens = batch["condition_token"]
        B = mel.shape[0]
        t, pt = sample_timesteps(k_t, state.lt, B, T)

        params_all = {"codec": frozen["codec"], "cond": frozen["cond"], "diffusion": None}

        def loss_fn(diff_params):
            p = dict(params_all, diffusion=diff_params)
            out = model.loss(p, k_loss, mel, cond_tokens, t, pt, is_train=True)
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        if clip_grad is not None:
            grads, gnorm = clip_grad(grads, state.step)
        else:
            from .clip_grad import clip_by_global_norm
            grads, gnorm = clip_by_global_norm(grads, 1.0, False)

        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        inner = state.params["params"] if "params" in state.params else state.params
        g_inner = grads["params"] if "params" in grads else grads
        updates, opt_state = tx.update(g_inner, opt_state, inner)
        new_inner = optax.apply_updates(inner, updates)
        new_params = dict(state.params, params=new_inner) if "params" in state.params else new_inner

        new_step = state.step + 1
        if state.ema_params is not None:
            do_ema = (new_step % ema_interval) == 0
            ema_params = ema_update(state.ema_params, new_params, ema_decay, do_ema)
        else:
            ema_params = None

        lt = update_timestep_state(state.lt, t, out.kl_loss)

        new_state = state.replace(
            step=new_step, params=new_params, opt_state=opt_state,
            ema_params=ema_params, lt=lt,
        )
        metrics = TrainMetrics(loss=loss, grad_norm=gnorm, acc_x0=out.acc_x0,
                               acc_keep=out.acc_keep, t=t)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)

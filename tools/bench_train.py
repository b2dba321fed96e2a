#!/usr/bin/env python
"""Training-throughput benchmark: full Stage-2 train step at production size.

Reference training scale (SURVEY §6): batch 20/chip on the 19L x 1024d denoiser
with frozen VQGAN encode + frozen CLIP embed per step. Prints one JSON line per
batch size: steps/sec, clips/sec/chip, and content tokens/sec.
"""

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    from text_to_sound_synthesis_tpu.engine.clip_grad import ClipGradNorm
    from text_to_sound_synthesis_tpu.engine.optimizers import build_optimizer
    from text_to_sound_synthesis_tpu.engine.train_state import (
        DiffusionTrainState,
        make_train_step,
    )
    from text_to_sound_synthesis_tpu.models.diffsound import build_model
    from text_to_sound_synthesis_tpu.utils.config import load_yaml_config

    positional = [a for a in sys.argv[1:] if not a.startswith("-")]
    dtype = positional[0] if positional else "float32"
    cfg = load_yaml_config("configs/diffsound_audiocaps.yaml")
    # activation dtype: 'float32' (reference parity) or 'bfloat16' (TPU-native,
    # ~28% faster at batch 20)
    cfg["model"]["params"]["dtype"] = dtype
    model = build_model(cfg)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    params = jax.jit(lambda k: model.init_params(k))(key)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)
    frozen = {"codec": params["codec"], "cond": params["cond"]}

    tx = build_optimizer({"target": "adamw",
                          "params": {"betas": (0.9, 0.96), "weight_decay": 0.045}}, 3e-6)
    clip = ClipGradNorm(0, 5000, 0.5)
    step = make_train_step(model, tx, clip, ema_decay=0.99, ema_interval=25)
    rng = np.random.default_rng(0)

    for B in (20,):
        state = DiffusionTrainState.create(params["diffusion"], tx, num_timesteps=100)
        batch = {
            "image": jnp.asarray(rng.standard_normal((B, 80, 848, 1)), jnp.float32),
            "condition_token": jnp.asarray(rng.integers(0, 49408, (B, 77)), jnp.int32),
        }
        t0 = time.time()
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(1), 3e-6)
        _ = float(jax.device_get(metrics.loss))
        print(f"compile+first step (B={B}): {time.time() - t0:.1f}s", file=sys.stderr)

        if "--trace" in sys.argv:
            holder = {"state": state}

            def _once():
                # the step donates its state — rebind so each trace call
                # consumes a live buffer, not an already-donated one
                s, m = step(holder["state"], frozen, batch,
                            jax.random.PRNGKey(3), 3e-6)
                holder["state"] = s
                return s, m

            _trace_step(_once)
            return

        iters = 10
        t0 = time.time()
        for i in range(iters):
            state, metrics = step(state, frozen, batch, jax.random.PRNGKey(2 + i), 3e-6)
        _ = float(jax.device_get(metrics.loss))
        dt = (time.time() - t0) / iters
        print(json.dumps({
            "config": f"diffsound_train_step_batch{B}",
            "steps_per_sec": round(1.0 / dt, 3),
            "clips_per_sec_per_chip": round(B / dt, 2),
            "content_tokens_per_sec": round(B * 265 / dt, 0),
        }))

        # solver hot-loop patterns (VERDICT.md weak #3 / next #5): the
        # reference semantics fetch THIS step's loss for the plateau scheduler
        # every iteration (solver_spec.py:328) — a host sync per step; the
        # rebuilt Solver.train_epoch consumes the PREVIOUS step's metrics
        # after dispatching the current one, hiding the host round-trip.
        def host_consume(m):
            loss, gn, t_, a0, ak = jax.device_get(
                (m.loss, m.grad_norm, m.t, m.acc_x0, m.acc_keep))
            return float(loss) + float(gn) + float(np.asarray(a0)[0])

        for mode in ("sync_every_step", "lagged_consume"):
            t0 = time.time()
            pending = None
            for i in range(iters):
                state, metrics = step(state, frozen, batch,
                                      jax.random.PRNGKey(50 + i), 3e-6)
                if mode == "sync_every_step":
                    host_consume(metrics)
                else:
                    if pending is not None:
                        host_consume(pending)
                    pending = metrics
            if pending is not None:
                host_consume(pending)
            dt = (time.time() - t0) / iters
            print(json.dumps({
                "config": f"solver_loop_{mode}_batch{B}",
                "steps_per_sec": round(1.0 / dt, 3),
                "clips_per_sec_per_chip": round(B / dt, 2),
            }))


def _trace_step(run_once, top=24):
    """Device-trace the stage-2 train step; aggregate per-op-TYPE and by
    hlo_category — wall-clock through the relay lies, and XLA names fusions
    after their LAST op (utils/trace.py)."""
    import jax

    from text_to_sound_synthesis_tpu.utils.trace import DeviceTrace

    run_once()  # compile + warm

    def once():
        state, metrics = run_once()
        _ = float(jax.device_get(metrics.loss))

    tr = DeviceTrace.capture(once, "/tmp/t2s_train_trace/diffsound")
    print(f"device step: {tr.jit_wrapper_us()/1e3:.2f} ms")
    for k, (us, n) in tr.by_name(strip_instance=True, top=top):
        print(f"  {us/1e3:9.2f} ms x{n:<5d} {k}")
    print("by hlo_category:")
    for k, (us, n) in tr.by_category()[:8]:
        print(f"  {us/1e3:9.2f} ms x{n:<5d} {k}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Device-trace budget for the int8 sampler: run a few steps under
``jax.profiler.trace`` and aggregate per-kernel device time from the exported
Chrome-trace JSON (no tensorboard/tensorflow needed).

Usage: python tools/trace_int8.py [steps=20] [impl=pallas] [static] [w4]
Prints total device time per kernel name (top 25) for ONE sampler invocation.
An arg of "static" calibrates static activation scales on the benchmark
conditioning first (models/diffusion/calibrate.py) and traces the
abs-max-free static-quant engine instead of the dynamic one; "w4" builds the
nibble-packed W4A8 engine (quantize_denoiser weight_bits=4, round 5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 8


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    impl = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    static = "static" in sys.argv[3:]
    w4 = "w4" in sys.argv[3:]

    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
    from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
        quantize_denoiser,
        sample_tokens_int8,
    )

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    denoiser = DiscreteDiffusion(
        transformer_config={
            "params": dict(
                n_layer=19, n_embd=1024, n_head=16, content_seq_len=265,
                condition_dim=512, content_spatial_size=(5, 53),
                block_activate="GELU2",
            )
        },
        content_emb_config={"params": dict(num_embed=256, embed_dim=1024,
                                           spatial_size=(5, 53))},
        diffusion_step=steps,
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    dshapes = jax.eval_shape(lambda: denoiser.init(
        key, jnp.zeros((1, 265), jnp.int32), jnp.zeros((1, 77, 512), jnp.float32),
        jnp.zeros((1,), jnp.int32)))
    cnt = [0]

    def mk(s):
        cnt[0] += 1
        return (jax.random.normal(jax.random.PRNGKey(cnt[0]), s.shape, jnp.float32)
                * 0.02).astype(s.dtype)

    dparams = jax.tree_util.tree_map(mk, dshapes)
    qp = jax.device_put(quantize_denoiser(dparams, n_head=16, seq_len=265,
                                          num_timesteps=steps,
                                          weight_bits=4 if w4 else 8))
    sched = denoiser.schedule()
    cond = jax.random.normal(jax.random.PRNGKey(7), (BATCH, 77, 512), jnp.float32)
    cond = cond / jnp.linalg.norm(cond, axis=-1, keepdims=True)

    if static:
        from text_to_sound_synthesis_tpu.models.diffusion.calibrate import (
            calibrate_act_scales,
        )

        from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
            unpack_denoiser,
        )

        t0 = time.time()
        # the calibration pass runs the stacked-jnp path -> plain int8 values
        scales = calibrate_act_scales(unpack_denoiser(qp), sched,
                                      jax.random.PRNGKey(9), cond,
                                      truncation_r=0.85)
        qp = qp.replace(act_scales=scales)
        print(f"calibration {time.time() - t0:.1f}s", file=sys.stderr)

    @jax.jit
    def run(qp, key, cond):
        return sample_tokens_int8(qp, sched, key, cond, truncation_r=0.85,
                                  impl=impl)

    t0 = time.time()
    out = run(qp, jax.random.PRNGKey(1), cond)
    _ = np.asarray(out[0, :2])
    print(f"compile+first {time.time() - t0:.1f}s", file=sys.stderr)

    from text_to_sound_synthesis_tpu.utils.trace import DeviceTrace

    tr = DeviceTrace.capture(
        lambda: np.asarray(run(qp, jax.random.PRNGKey(2), cond)[0, :2]),
        "/tmp/t2s_trace")

    total = tr.total_us(include_wrappers=True)
    print(f"\ntotal device event time: {total/1e3:.2f} ms over {steps} steps "
          f"({total/1e3/steps:.3f} ms/step)  "
          f"[jit dispatch {tr.jit_wrapper_us()/1e3:.2f} ms]\n")
    for name, (us, n) in tr.by_name(top=25):
        print(f"{us/1e3:9.3f} ms  {us/steps:8.1f} us/step  x{n:<5d} {name[:90]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Flagship 100-step sampler: bf16 fused path vs int8 serving engine (v5e-1).

Same config as bench.py (19L x 1024d denoiser, batch 8, top-0.85r, VQGAN
decode included for the full-pipeline rows). Prints ms/step and clips/sec for
each path. Timing per CLAUDE.md: tiny dependent-slice host sync.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 8
STEPS = 100
TIMED_ITERS = 3


def main():
    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion
    from text_to_sound_synthesis_tpu.models.diffusion.process import (
        sample_tokens_fused,
    )
    from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
        quantize_denoiser,
        sample_tokens_int8,
    )

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

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
        diffusion_step=STEPS,
        dtype=jnp.bfloat16,
    )

    key = jax.random.PRNGKey(0)
    tokens0 = jnp.zeros((1, 265), jnp.int32)
    cond0 = jnp.zeros((1, 77, 512), jnp.float32)
    dshapes = jax.eval_shape(lambda: denoiser.init(key, tokens0, cond0,
                                                   jnp.zeros((1,), jnp.int32)))
    # small random values, not zeros: zero weights would quantize to degenerate
    # scales and risk unrepresentative layouts
    cnt = [0]

    def mk(s):
        cnt[0] += 1
        return (jax.random.normal(jax.random.PRNGKey(cnt[0]), s.shape, jnp.float32)
                * 0.02).astype(s.dtype)

    dparams = jax.tree_util.tree_map(mk, dshapes)
    qp = quantize_denoiser(dparams, n_head=16, seq_len=265, num_timesteps=STEPS)
    qp = jax.device_put(qp)
    sched = denoiser.schedule()

    cond = jax.random.normal(jax.random.PRNGKey(7), (BATCH, 77, 512), jnp.float32)
    cond = cond / jnp.linalg.norm(cond, axis=-1, keepdims=True)

    @jax.jit
    def run_bf16(dparams, key, cond):
        return sample_tokens_fused(denoiser, dparams, key, cond, truncation_r=0.85)

    @jax.jit
    def run_int8(qp, key, cond):
        # NOTE: impl must be explicit — impl=None auto-selects pallas on TPU
        return sample_tokens_int8(qp, sched, key, cond, truncation_r=0.85,
                                  impl="xla")

    @jax.jit
    def run_int8_pallas(qp, key, cond):
        return sample_tokens_int8(qp, sched, key, cond, truncation_r=0.85,
                                  impl="pallas")

    @jax.jit
    def run_int8_pallas_dense(qp, key, cond):
        return sample_tokens_int8(qp, sched, key, cond, truncation_r=0.85,
                                  impl="pallas_dense")

    def timed(fn, *args):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(out[0, :2])
        print(f"  compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for i in range(TIMED_ITERS):
            out = fn(*args)
            _ = np.asarray(out[0, :2])
        dt = (time.time() - t0) / TIMED_ITERS
        return dt

    results = {}
    for name, fn, args in [
        ("bf16_fused", run_bf16, (dparams, jax.random.PRNGKey(1), cond)),
        ("int8_xla", run_int8, (qp, jax.random.PRNGKey(1), cond)),
        ("int8_pallas", run_int8_pallas, (qp, jax.random.PRNGKey(1), cond)),
        ("int8_pallas_dense", run_int8_pallas_dense, (qp, jax.random.PRNGKey(1), cond)),
    ]:
        try:
            dt = timed(fn, *args)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        results[name] = dt
        print(f"{name:12s} {dt*1e3/STEPS:6.2f} ms/step  "
              f"{BATCH/dt:6.2f} clips/sec (sampler only)")
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Microbenchmark: bf16 vs int8 matmul at the denoiser's shapes (v5e-1).

Validates the premise of the int8 serving path (ops/quant.py): the v5e MXU
runs int8 at 2x the bf16 rate, and the fused Pallas kernel keeps the dynamic
quantization out of HBM so the advantage survives end to end.

Methodology (axon-relay-safe, see CLAUDE.md):
- weights are jit ARGUMENTS (device-resident) — closed-over arrays become
  program constants that the relay re-ships per call;
- differential timing: run the in-jit scan at N and 4N iterations and take
  the slope, cancelling per-call dispatch/sync overhead entirely;
- the scan carries the activation through every iteration so XLA cannot
  hoist or CSE the body.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from functools import partial

from text_to_sound_synthesis_tpu.ops import quant

N_LO, N_HI = 256, 2048
# (name, M, K, N): flagship denoiser batch-8 shapes, M padded to 128
SHAPES = [
    ("qkv 2176x1024x3072", 2176, 1024, 3072),
    ("proj 2176x1024x1024", 2176, 1024, 1024),
    ("fc1 2176x1024x4096", 2176, 1024, 4096),
    ("fc2 2176x4096x1024", 2176, 4096, 1024),
]


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:2]


def slope_time(fn, args_lo, args_hi, iters_lo, iters_hi):
    """Seconds per iteration via two-point fit (fixed overhead cancels)."""
    sync(fn(*args_lo)); sync(fn(*args_hi))        # compile both
    t_lo = t_hi = np.inf
    for _ in range(3):
        t0 = time.time(); sync(fn(*args_lo)); t_lo = min(t_lo, time.time() - t0)
        t0 = time.time(); sync(fn(*args_hi)); t_hi = min(t_hi, time.time() - t0)
    return (t_hi - t_lo) / (iters_hi - iters_lo)


def chain(y, K, N):
    """Feed the output back into the carry (data dependency across iters)."""
    if N >= K:
        return y[:, :K]
    return jnp.concatenate([y] * (K // N), axis=1)


def bench_shape(name, M, K, N):
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    wf = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32) * 0.02
    w_bf16 = jax.device_put(wf.astype(jnp.bfloat16))
    wq = jax.device_put(quant.quantize_weight(wf))
    xq8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 8), -127, 127).astype(jnp.int8)
    mod = jnp.ones((2, K), jnp.float32) * 0.1
    flops = 2 * M * K * N

    @partial(jax.jit, static_argnums=2)
    def run_bf16(x, w, iters):
        def body(h, _):
            y = jnp.dot(h, w, preferred_element_type=jnp.float32)
            return chain(y, K, N).astype(jnp.bfloat16), ()
        return jax.lax.scan(body, x, length=iters)[0]

    @partial(jax.jit, static_argnums=2)
    def run_int8_static(h0, w, iters):
        def body(h, _):
            y = jnp.dot(h, w.w_q, preferred_element_type=jnp.int32)
            return chain(y, K, N).astype(jnp.int8), ()
        return jax.lax.scan(body, h0, length=iters)[0]

    @partial(jax.jit, static_argnums=2)
    def run_int8_xla_dynamic(x, w, iters):
        def body(h, _):
            q, s = quant._quantize_rows(h.astype(jnp.float32))
            y = jnp.dot(q, w.w_q, preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (s * w.scale)
            return chain(y, K, N).astype(jnp.bfloat16), ()
        return jax.lax.scan(body, x, length=iters)[0]

    @partial(jax.jit, static_argnums=2)
    def run_pallas(x, w, iters):
        def body(h, _):
            y = quant.fused_quant_dense(h, w, norm="none", act="none")
            return chain(y, K, N).astype(jnp.bfloat16), ()
        return jax.lax.scan(body, x, length=iters)[0]

    @partial(jax.jit, static_argnums=3)
    def run_pallas_full(x, w, mod, iters):
        def body(h, _):
            y = quant.fused_quant_dense(h, w, norm="adaln", mod=mod, act="gelu2")
            return chain(y, K, N).astype(jnp.bfloat16), ()
        return jax.lax.scan(body, x, length=iters)[0]

    print(f"--- {name} ---")
    rows = [
        ("bf16 XLA", run_bf16, (x, w_bf16)),
        ("int8 static (MXU ceiling)", run_int8_static, (xq8, wq)),
        ("int8 XLA dynamic-quant", run_int8_xla_dynamic, (x, wq)),
        ("int8 pallas fused", run_pallas, (x, wq)),
        ("int8 pallas fused+adaln+gelu2", run_pallas_full, (x, wq, mod)),
    ]
    base = None
    for label, fn, args in rows:
        try:
            dt = slope_time(fn, args + (N_LO,), args + (N_HI,), N_LO, N_HI)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:34s} FAILED: {type(e).__name__}: {str(e)[:160]}")
            continue
        if base is None:
            base = dt
        print(f"  {label:34s} {dt*1e3:7.3f} ms/it  {flops/dt/1e12:7.1f} TFLOP/s  "
              f"({base/dt:4.2f}x bf16)")


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    for spec in SHAPES:
        bench_shape(*spec)


if __name__ == "__main__":
    main()

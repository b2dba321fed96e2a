#!/usr/bin/env python
"""Microbenchmark: bf16 vs int8 matmul at the denoiser's shapes (v5e-1).

Validates the premise of the int8 serving path (ops/quant.py): the v5e MXU
runs int8 at 2x the bf16 rate, and the fused Pallas kernel keeps the dynamic
quantization out of HBM so the advantage survives end to end.

Timing per CLAUDE.md: in-jit lax.scan repeats with a carried data dependency
(so XLA cannot hoist the loop body), sync via a tiny host transfer.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.ops import quant

ITERS = 50
# (name, M, K, N): flagship denoiser batch-8 shapes, M padded to 128
SHAPES = [
    ("qkv 2176x1024x3072", 2176, 1024, 3072),
    ("proj 2176x1024x1024", 2176, 1024, 1024),
    ("fc1 2176x1024x4096", 2176, 1024, 4096),
    ("fc2 2176x4096x1024", 2176, 4096, 1024),
]


def timed(fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]  # sync
    t0 = time.time()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]
    return time.time() - t0


def bench_shape(name, M, K, N):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    wf = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32) * 0.02
    w_bf16 = wf.astype(jnp.bfloat16)
    wq = quant.quantize_weight(wf)
    flops = 2 * M * K * N * ITERS

    @jax.jit
    def run_bf16(x):
        def body(h, _):
            y = jnp.dot(h, w_bf16, preferred_element_type=jnp.float32)
            # fold output back into the carry to chain iterations
            h = (y[:, :K] if N >= K else jnp.concatenate(
                [y] * (K // N), axis=1)).astype(jnp.bfloat16)
            return h, ()
        h, _ = jax.lax.scan(body, x, length=ITERS)
        return h

    @jax.jit
    def run_int8_static(xq):
        # pre-quantized activations: the raw int8 MXU rate (upper bound)
        def body(h, _):
            y = jnp.dot(h, wq.w_q, preferred_element_type=jnp.int32)
            h = (y[:, :K] if N >= K else jnp.concatenate(
                [y] * (K // N), axis=1)).astype(jnp.int8)
            return h, ()
        h, _ = jax.lax.scan(body, xq, length=ITERS)
        return h

    @jax.jit
    def run_int8_xla_dynamic(x):
        # quantize in XLA each iteration (the round-1 "wash" configuration)
        def body(h, _):
            q, s = quant._quantize_rows(h.astype(jnp.float32))
            y = jnp.dot(q, wq.w_q, preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (s * wq.scale)
            h = (y[:, :K] if N >= K else jnp.concatenate(
                [y] * (K // N), axis=1)).astype(jnp.bfloat16)
            return h, ()
        h, _ = jax.lax.scan(body, x, length=ITERS)
        return h

    @jax.jit
    def run_pallas_fused(x):
        def body(h, _):
            y = quant.fused_quant_dense(h, wq, norm="none", act="none")
            h = (y[:, :K] if N >= K else jnp.concatenate(
                [y] * (K // N), axis=1)).astype(jnp.bfloat16)
            return h, ()
        h, _ = jax.lax.scan(body, x, length=ITERS)
        return h

    @jax.jit
    def run_pallas_fused_adaln(x):
        mod = jnp.ones((2, K), jnp.float32) * 0.1
        def body(h, _):
            y = quant.fused_quant_dense(h, wq, norm="adaln", mod=mod, act="gelu2")
            h = (y[:, :K] if N >= K else jnp.concatenate(
                [y] * (K // N), axis=1)).astype(jnp.bfloat16)
            return h, ()
        h, _ = jax.lax.scan(body, x, length=ITERS)
        return h

    print(f"--- {name} ---")
    rows = [("bf16 XLA", run_bf16, x),
            ("int8 static (MXU ceiling)", run_int8_static,
             jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(jnp.int8)),
            ("int8 XLA dynamic-quant", run_int8_xla_dynamic, x),
            ("int8 pallas fused", run_pallas_fused, x),
            ("int8 pallas fused+adaln+gelu2", run_pallas_fused_adaln, x)]
    base = None
    for label, fn, arg in rows:
        try:
            dt = timed(fn, arg)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:34s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        tflops = flops / dt / 1e12
        if base is None:
            base = dt
        print(f"  {label:34s} {dt/ITERS*1e3:7.3f} ms/it  {tflops:7.1f} TFLOP/s  "
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

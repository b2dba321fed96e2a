#!/usr/bin/env python
"""A/B: Mosaic in-kernel int8 dot vs XLA's int8 dot at the fc1 shape.

The device trace (tools/trace_int8.py) puts mlp_block at 146us/layer vs a
93us pure-dot nameplate floor; tools/bench_int8_micro.py suggests XLA's
int8 dot reaches ~374 TOPS. This isolates the in-kernel dot rate across
block sizes / accumulator types to find the fastest Mosaic formulation.

Timing: in-jit lax.scan with a carried data dependency, ONE warm run timed
over `ITERS` iterations (no slope games), tiny dependent-slice sync.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 2176, 1024, 4096
ITERS = 200


def dot_kernel(x_ref, w_ref, o_ref, *, acc):
    o_ref[:, :] = jnp.dot(x_ref[:, :], w_ref[:, :], preferred_element_type=acc)


def make_pallas_dot(block_m, acc=jnp.int32, out_dtype=None, block_n=None):
    out_dtype = out_dtype or acc
    bn = block_n or N

    def f(x, w):
        return pl.pallas_call(
            partial(dot_kernel, acc=acc),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            grid_spec=pl.GridSpec(
                grid=(M // block_m, N // bn),
                in_specs=[
                    pl.BlockSpec((block_m, K), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, bn), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((block_m, bn), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
            ),
        )(x, w)
    return f


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    kx = jax.random.PRNGKey(0)
    x8 = jax.random.randint(kx, (M, K), -127, 128, jnp.int8)
    w8 = jax.device_put(jax.random.randint(jax.random.PRNGKey(1), (K, N), -127, 128,
                                           jnp.int8))
    xb = (x8.astype(jnp.float32) / 127.0).astype(jnp.bfloat16)
    wb = jax.device_put((np.asarray(w8, np.float32) / 127.0).astype(jnp.bfloat16))
    flops = 2.0 * M * K * N

    def timed(name, dotfn, x0, w, feed):
        @jax.jit
        def run(x0, w):
            def body(h, _):
                y = dotfn(h, w)
                return feed(y), ()
            return jax.lax.scan(body, x0, length=ITERS)[0]

        try:
            out = run(x0, w)
            _ = np.asarray(out).ravel()[:2]
            t0 = time.time()
            out = run(x0, w)
            _ = np.asarray(out).ravel()[:2]
            dt = (time.time() - t0) / ITERS
        except Exception as e:  # noqa: BLE001
            print(f"  {name:40s} FAILED {type(e).__name__}: {str(e)[:120]}")
            return
        print(f"  {name:40s} {dt*1e6:8.1f} us  {flops/dt/1e12:7.1f} TOPS")

    # feed functions keep a data dependency with matching dtype/shape
    def feed_i8(y):  # (M, N) int -> int8 (M, K)
        return jnp.clip(y[:, :K] + y[:, K:2 * K], -127, 127).astype(jnp.int8)

    def feed_bf16(y):
        return (y[:, :K] + y[:, K:2 * K]).astype(jnp.bfloat16) * 0.0001

    print(f"fc1 shape {M}x{K}x{N}, {ITERS} chained iters")
    timed("XLA int8->int32", lambda h, w: jnp.dot(h, w, preferred_element_type=jnp.int32),
          x8, w8, feed_i8)
    timed("XLA bf16->f32", lambda h, w: jnp.dot(h, w, preferred_element_type=jnp.float32),
          xb, wb, feed_bf16)
    for bm in (128, 272, 544):
        timed(f"pallas int8->int32 bm={bm}", make_pallas_dot(bm), x8, w8, feed_i8)
    timed("pallas int8->int32 bm=272 bn=2048",
          make_pallas_dot(272, block_n=2048), x8, w8, feed_i8)
    timed("pallas int8->f32 bm=272",
          make_pallas_dot(272, acc=jnp.float32), x8, w8,
          lambda y: jnp.clip(y[:, :K] + y[:, K:2 * K], -127, 127).astype(jnp.int8))
    timed("pallas bf16->f32 bm=272",
          make_pallas_dot(272, acc=jnp.float32, out_dtype=jnp.float32), xb, wb,
          feed_bf16)


if __name__ == "__main__":
    main()

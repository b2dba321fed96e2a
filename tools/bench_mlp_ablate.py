#!/usr/bin/env python
"""Ablate the int8 MLP block kernel to locate its time (r3 perf push).

Trace says mlp_block = ~135 us/layer vs a 93 us pure-int8-dot floor. Each
variant below removes one piece of the in-kernel chain; the deltas attribute
the gap to MXU dot rate vs the VPU prologue/epilogue passes.

Timing: in-jit lax.scan with a carried data dependency (CLAUDE.md: never
trust relay-side micro timings without it), tiny dependent-slice sync.
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

from text_to_sound_synthesis_tpu.ops.quant import (
    _gelu2,
    _prologue,
    _quantize_rows,
    quantize_weight,
)
from text_to_sound_synthesis_tpu.ops import int8_block as IB

M, D, DH = 2176, 1024, 4096
ITERS = 100


def make_variant(name, block_m=272):
    """Returns pallas_call f(x, mod, w1q, w2q, s1, s2, b1, b2) -> (M, D) bf16."""

    def kernel(x_ref, mod_ref, w1_ref, w2_ref, s1_ref, s2_ref, b1_ref, b2_ref,
               out_ref):
        x = x_ref[:, :].astype(jnp.float32)
        if name == "dots_only":
            qx = x_ref[:, :].astype(jnp.int8)
            acc1 = jnp.dot(qx, w1_ref[:, :], preferred_element_type=jnp.int32)
            qu = acc1.astype(jnp.int8)
            acc2 = jnp.dot(qu, w2_ref[:, :], preferred_element_type=jnp.int32)
            out_ref[:, :] = acc2.astype(out_ref.dtype)
            return
        if name == "no_prologue":
            h = x
        elif name == "ln_onepass":
            # mean/var from one traversal: E[x], E[x^2]
            s1 = jnp.sum(x, axis=-1, keepdims=True)
            s2 = jnp.sum(x * x, axis=-1, keepdims=True)
            mean = s1 / x.shape[-1]
            var = s2 / x.shape[-1] - mean * mean
            h = (x - mean) * jax.lax.rsqrt(var + 1e-6)
            h = h * mod_ref[0:1, :].astype(jnp.float32) + mod_ref[1:2, :].astype(jnp.float32)
        else:
            h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                          mod_ref[1:2, :].astype(jnp.float32), "ln")
        qx, s = _quantize_rows(h)
        acc1 = jnp.dot(qx, w1_ref[:, :], preferred_element_type=jnp.int32)
        if name == "mid_bf16":
            # the whole (M, 4D) intermediate chain in bf16: if the VPU packs
            # bf16 2/lane this halves the dominant VPU cost
            u = (acc1.astype(jnp.bfloat16) * (s.astype(jnp.bfloat16)
                 * s1_ref[0:1, :].astype(jnp.bfloat16))
                 + b1_ref[0:1, :].astype(jnp.bfloat16))
            u = u * jax.nn.sigmoid(1.702 * u)
            amax = jnp.max(jnp.abs(u), axis=-1, keepdims=True)
            su = (jnp.maximum(amax, 1e-6) / 127.0)
            qu = jnp.clip(jnp.round(u / su), -127, 127).astype(jnp.int8)
            acc2 = jnp.dot(qu, w2_ref[:, :], preferred_element_type=jnp.int32)
            y = (acc2.astype(jnp.float32)
                 * (su.astype(jnp.float32) * s2_ref[0:1, :]) + b2_ref[0:1, :] + x)
            out_ref[:, :] = y.astype(out_ref.dtype)
            return
        if name == "mid_bf16c":
            # bf16 deq + manual sigmoid (exp/recip lower fine in bf16; only
            # jax.nn.sigmoid's internal const broadcast and bf16 round are
            # toolchain-blocked); f32 just for the final round
            one = jnp.bfloat16(1.0)
            u = (acc1.astype(jnp.bfloat16) * (s.astype(jnp.bfloat16)
                 * s1_ref[0:1, :].astype(jnp.bfloat16))
                 + b1_ref[0:1, :].astype(jnp.bfloat16))
            z = jnp.bfloat16(-1.702) * u
            u = u * (one / (one + jnp.exp(z)))
            amax = jnp.max(jnp.abs(u), axis=-1, keepdims=True).astype(jnp.float32)
            su = jnp.maximum(amax, 1e-6) / 127.0
            qu = jnp.clip(jnp.round(u.astype(jnp.float32) / su), -127, 127
                          ).astype(jnp.int8)
            acc2 = jnp.dot(qu, w2_ref[:, :], preferred_element_type=jnp.int32)
            y = acc2.astype(jnp.float32) * (su * s2_ref[0:1, :]) + b2_ref[0:1, :] + x
            out_ref[:, :] = y.astype(out_ref.dtype)
            return
        if name == "mid_bf16b":
            # deq + GELU2 in bf16; upcast only for the int8 round/cast
            u = (acc1.astype(jnp.bfloat16) * (s.astype(jnp.bfloat16)
                 * s1_ref[0:1, :].astype(jnp.bfloat16))
                 + b1_ref[0:1, :].astype(jnp.bfloat16))
            u = u * jax.nn.sigmoid(1.702 * u)
            amax = jnp.max(jnp.abs(u), axis=-1, keepdims=True).astype(jnp.float32)
            su = jnp.maximum(amax, 1e-6) / 127.0
            qu = jnp.clip(jnp.round(u.astype(jnp.float32) / su), -127, 127
                          ).astype(jnp.int8)
            acc2 = jnp.dot(qu, w2_ref[:, :], preferred_element_type=jnp.int32)
            y = acc2.astype(jnp.float32) * (su * s2_ref[0:1, :]) + b2_ref[0:1, :] + x
            out_ref[:, :] = y.astype(out_ref.dtype)
            return
        if name == "fast_sigmoid":
            # sigmoid(z) ~ 0.5 + 0.5 z/(1+|z|): no exp, pure cheap VPU ops
            u = acc1.astype(jnp.float32) * (s * s1_ref[0:1, :]) + b1_ref[0:1, :]
            z = 1.702 * u
            u = u * (0.5 + 0.5 * z / (1.0 + jnp.abs(z)))
            qu, su = _quantize_rows(u)
            acc2 = jnp.dot(qu, w2_ref[:, :], preferred_element_type=jnp.int32)
            y = acc2.astype(jnp.float32) * (su * s2_ref[0:1, :]) + b2_ref[0:1, :] + x
            out_ref[:, :] = y.astype(out_ref.dtype)
            return
        if name == "no_deq_mid":
            u32 = acc1
            qu = jnp.clip(u32 >> 7, -127, 127).astype(jnp.int8)
            su = s
        else:
            u = acc1.astype(jnp.float32) * (s * s1_ref[0:1, :]) + b1_ref[0:1, :]
            if name != "no_gelu":
                u = _gelu2(u)
            if name == "no_quant_mid":
                qu = jnp.clip(u, -127, 127).astype(jnp.int8)
                su = s
            else:
                qu, su = _quantize_rows(u)
        acc2 = jnp.dot(qu, w2_ref[:, :], preferred_element_type=jnp.int32)
        y = acc2.astype(jnp.float32) * (su * s2_ref[0:1, :]) + b2_ref[0:1, :] + x
        out_ref[:, :] = y.astype(out_ref.dtype)

    def f(x, mod, w1, w2, s1, s2, b1, b2):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
            grid_spec=pl.GridSpec(
                grid=(M // block_m,),
                in_specs=[
                    pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((D, DH), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((DH, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DH), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DH), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((block_m, D), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, mod, w1, w2, s1, s2, b1, b2)

    return f


def make_skewed(n_chunks=4, static=False, block_m=272, skew=True):
    """Hidden-dim-chunked MLP with the NEXT chunk's fc1 dot issued BEFORE the
    current chunk's VPU epilogue in program order (software pipelining by
    hand). r3's `lib_chunked` kept program order [epi(c); dot2(c); dot1(c+1)]
    — Mosaic schedules program order, so the independent dot1(c+1) was never
    positioned where it could overlap epi(c). This variant emits
    [dot1(c+1); epi(c); dot2(c)]: if the MXU issue is asynchronous w.r.t.
    subsequent independent VPU ops, epi(c) hides under dot1(c+1).
    ``skew=False`` gives the same chunk structure WITHOUT the reorder — the
    control for attributing any delta to the reorder itself."""
    from text_to_sound_synthesis_tpu.ops.quant import _quantize_static

    def q(h, s_static):
        return _quantize_static(h, s_static) if static else _quantize_rows(h)

    def kernel(x_ref, mod_ref, w1_ref, w2_ref, s1_ref, s2_ref, b1_ref, b2_ref,
               out_ref):
        x = x_ref[:, :].astype(jnp.float32)
        h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                      mod_ref[1:2, :].astype(jnp.float32), "ln")
        qx, s = q(h, 0.05)
        ck = DH // n_chunks
        y = x
        acc_cur = jnp.dot(qx, w1_ref[:, 0:ck], preferred_element_type=jnp.int32)
        for c in range(n_chunks):
            nxt = None
            if skew and c + 1 < n_chunks:
                nsl = slice((c + 1) * ck, (c + 2) * ck)
                nxt = jnp.dot(qx, w1_ref[:, nsl],
                              preferred_element_type=jnp.int32)
            sl = slice(c * ck, (c + 1) * ck)
            u = acc_cur.astype(jnp.float32) * (s * s1_ref[0:1, sl]) + b1_ref[0:1, sl]
            u = _gelu2(u)
            qu, su = q(u, 0.05)
            acc2 = jnp.dot(qu, w2_ref[sl, :], preferred_element_type=jnp.int32)
            y = y + acc2.astype(jnp.float32) * (su * s2_ref[0:1, :])
            if not skew and c + 1 < n_chunks:
                nsl = slice((c + 1) * ck, (c + 2) * ck)
                nxt = jnp.dot(qx, w1_ref[:, nsl],
                              preferred_element_type=jnp.int32)
            acc_cur = nxt
        out_ref[:, :] = (y + b2_ref[0:1, :]).astype(out_ref.dtype)

    def f(x, mod, w1, w2, s1, s2, b1, b2):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
            grid_spec=pl.GridSpec(
                grid=(M // block_m,),
                in_specs=[
                    pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((D, DH), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((DH, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DH), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DH), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((block_m, D), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, mod, w1, w2, s1, s2, b1, b2)

    return f


def make_w4(static=False, scratch=False, block_m=272, i32=False):
    """W4A8: weights stored nibble-PACKED (K/2, N) int8 — two int4 values per
    byte (lo = w[:K/2], hi = w[K/2:]) — so the HBM weight stream halves.
    The MXU has no usable int4 operand path on this toolchain (a direct
    int4-dot kernel crashes tpu_compile_helper; even XLA astype(int4) hits a
    RecursionError in the runtime — see docs/ROOFLINE.md round 5), so the
    nibbles are unpacked to int8 on the VPU and fed to two half-K dots:

      acc = q[:, :K/2] @ sext(p << 4 >> 4) + q[:, K/2:] @ (p >> 4)

    ``scratch=True`` unpacks ONCE per invocation (program 0, sequential
    semantics) into VMEM scratch instead of per program — the best case for
    the unpack cost. ``i32=True`` does the shifts in int32 (fallback if
    Mosaic rejects int8 shifts)."""
    from text_to_sound_synthesis_tpu.ops.quant import _quantize_static

    def q(h):
        return _quantize_static(h, 0.05) if static else _quantize_rows(h)

    def unpack(p):
        if i32:
            p32 = p.astype(jnp.int32)
            hi = jax.lax.shift_right_arithmetic(p32, 4)
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(p32, 28), 28)
            return lo.astype(jnp.int8), hi.astype(jnp.int8)
        four = jnp.int8(4)
        hi = jax.lax.shift_right_arithmetic(p, four)
        lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p, four), four)
        return lo, hi

    def body(x_ref, mod_ref, s1_ref, s2_ref, b1_ref, b2_ref, out_ref,
             w1lo, w1hi, w2lo, w2hi):
        x = x_ref[:, :].astype(jnp.float32)
        h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                      mod_ref[1:2, :].astype(jnp.float32), "ln")
        qx, s = q(h)
        Kh = D // 2
        acc1 = (jnp.dot(qx[:, :Kh], w1lo, preferred_element_type=jnp.int32)
                + jnp.dot(qx[:, Kh:], w1hi, preferred_element_type=jnp.int32))
        u = acc1.astype(jnp.float32) * (s * s1_ref[0:1, :]) + b1_ref[0:1, :]
        u = _gelu2(u)
        qu, su = q(u)
        Dhh = DH // 2
        acc2 = (jnp.dot(qu[:, :Dhh], w2lo, preferred_element_type=jnp.int32)
                + jnp.dot(qu[:, Dhh:], w2hi, preferred_element_type=jnp.int32))
        y = acc2.astype(jnp.float32) * (su * s2_ref[0:1, :]) + b2_ref[0:1, :] + x
        out_ref[:, :] = y.astype(out_ref.dtype)

    if scratch:
        def kernel(x_ref, mod_ref, w1p_ref, w2p_ref, s1_ref, s2_ref,
                   b1_ref, b2_ref, out_ref,
                   w1lo_s, w1hi_s, w2lo_s, w2hi_s):
            @pl.when(pl.program_id(0) == 0)
            def _():
                lo1, hi1 = unpack(w1p_ref[:, :])
                w1lo_s[:, :] = lo1
                w1hi_s[:, :] = hi1
                lo2, hi2 = unpack(w2p_ref[:, :])
                w2lo_s[:, :] = lo2
                w2hi_s[:, :] = hi2

            body(x_ref, mod_ref, s1_ref, s2_ref, b1_ref, b2_ref, out_ref,
                 w1lo_s[:, :], w1hi_s[:, :], w2lo_s[:, :], w2hi_s[:, :])

        scratch_shapes = [pltpu.VMEM((D // 2, DH), jnp.int8),
                          pltpu.VMEM((D // 2, DH), jnp.int8),
                          pltpu.VMEM((DH // 2, D), jnp.int8),
                          pltpu.VMEM((DH // 2, D), jnp.int8)]
        semantics = ("arbitrary",)   # program 0 must run first
    else:
        def kernel(x_ref, mod_ref, w1p_ref, w2p_ref, s1_ref, s2_ref,
                   b1_ref, b2_ref, out_ref):
            lo1, hi1 = unpack(w1p_ref[:, :])
            lo2, hi2 = unpack(w2p_ref[:, :])
            body(x_ref, mod_ref, s1_ref, s2_ref, b1_ref, b2_ref, out_ref,
                 lo1, hi1, lo2, hi2)

        scratch_shapes = []
        semantics = ("parallel",)

    def f(x, mod, w1, w2, s1, s2, b1, b2):
        # PACK outside the kernel (one-off at engine build time in a real
        # deployment): requantize int8 -> int4 range, then nibble-pack
        def pack(w):
            w4 = jnp.clip(jnp.round(w.astype(jnp.float32) / 16.0), -7, 7
                          ).astype(jnp.int32)
            Kh = w.shape[0] // 2
            lo, hi = w4[:Kh], w4[Kh:]
            return ((hi << 4) | (lo & 0xF)).astype(jnp.int8)

        w1p, w2p = pack(w1), pack(w2)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
            grid=(M // block_m,),
            in_specs=[
                pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D // 2, DH), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((DH // 2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DH), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DH), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=semantics,
                vmem_limit_bytes=48 * 1024 * 1024 if scratch else None),
        )(x, mod, w1p, w2p, s1, s2, b1, b2)

    return f


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    x = jax.random.normal(jax.random.PRNGKey(0), (M, D), jnp.bfloat16)
    mod = jnp.stack([jnp.ones((D,), jnp.float32),
                     jnp.zeros((D,), jnp.float32)])
    w1 = quantize_weight(jax.random.normal(jax.random.PRNGKey(1), (D, DH)) * 0.02)
    w2 = quantize_weight(jax.random.normal(jax.random.PRNGKey(2), (DH, D)) * 0.02)
    args = (mod, w1.w_q, w2.w_q, w1.scale, w2.scale, w1.bias, w2.bias)
    flops = 2.0 * M * D * DH * 2

    def timed(name, fn):
        """Device-trace timing: wall-clock through the axon relay is a lie
        even for scan-chained runs (r2 ledger) — parse the Chrome trace and
        report the kernel's own device time (utils/trace.py)."""
        from text_to_sound_synthesis_tpu.utils.trace import DeviceTrace

        @jax.jit
        def run(x):
            def body(h, _):
                y = fn(h, *args)
                return y, ()
            return jax.lax.scan(body, x, length=ITERS)[0]

        try:
            out = run(x)
            _ = np.asarray(out).ravel()[:2]
            tr = DeviceTrace.capture(
                lambda: np.asarray(run(x)).ravel()[:2],
                f"/tmp/t2s_mlp_ablate/{name}")
            # the kernel of interest: biggest closed_call / custom-call row
            rows = [(v, k) for k, (v, _) in tr.by_name()
                    if "closed_call" in k or "custom" in k or "fusion" in k]
            if not rows:
                rows = [(tr.jit_wrapper_us(), "jit")]
            us, which = max(rows)
            dt = us / ITERS * 1e-6
        except Exception as e:  # noqa: BLE001
            print(f"  {name:28s} FAILED {type(e).__name__}: {str(e)[:100]}")
            return
        print(f"  {name:28s} {dt*1e6:8.1f} us/iter (device)  "
              f"{flops/dt/1e12:6.1f} TOPS-equiv   [{which[:40]}]")

    names = sys.argv[1:] or ["full", "dots_only", "no_gelu", "no_quant_mid",
                             "no_deq_mid", "no_prologue", "ln_onepass"]
    print(f"MLP block {M}x{D}x{DH}, block_m=272, {ITERS} chained iters")
    for n in names:
        if n == "lib_base":
            timed(n, lambda x, *a: IB.mlp_block(x, mod, w1, w2, block_m=272))
        elif n == "lib_static":
            # calibrated static activation scales: no abs-max passes (the
            # scale VALUES don't change the instruction count)
            timed(n, lambda x, *a: IB.mlp_block(x, mod, w1, w2, block_m=272,
                                                static_s=(0.05, 0.05)))
        elif n == "lib_chunked":
            timed(n, lambda x, *a: IB.mlp_block_chunked(x, mod, w1, w2,
                                                        block_m=544, n_chunks=4))
        elif n == "lib_chunked_static":
            # the r4 static serving default (chunked b544) through the
            # LIBRARY path — i.e. including _par_params' vmem_limit_bytes —
            # vs ctrl4_static_b544 (same math, harness CompilerParams)
            timed(n, lambda x, *a: IB.mlp_block_chunked(x, mod, w1, w2,
                                                        block_m=544, n_chunks=4,
                                                        static_s=(0.05, 0.05)))
        elif n.startswith("streamed"):
            # streamed[_static][_c{n_chunks}][_b{block_m}] — weight chunks as
            # a grid dimension so Mosaic prefetches chunk c+1's weights under
            # chunk c's dots (vs the whole-weight serial head of base/chunked)
            parts = n.split("_")
            nch = next((int(p[1:]) for p in parts
                        if p.startswith("c") and p[1:].isdigit()), 16)
            bm = next((int(p[1:]) for p in parts
                       if p.startswith("b") and p[1:].isdigit()), 1088)
            ss = (0.05, 0.05) if "static" in parts else None
            timed(n, lambda x, *a, _b=bm, _c=nch, _s=ss: IB.mlp_block_streamed(
                x, mod, w1, w2, block_m=_b, n_chunks=_c, static_s=_s))
        elif n.startswith("w4"):
            # w4[_static][_scratch][_i32][_b{block_m}]
            parts = n.split("_")
            bm = next((int(p[1:]) for p in parts
                       if p.startswith("b") and p[1:].isdigit()), 272)
            timed(n, make_w4(static="static" in parts,
                             scratch="scratch" in parts,
                             i32="i32" in parts, block_m=bm))
        elif n.startswith("skew") or n.startswith("ctrl"):
            # skew{4,8}[_static][_b544] / ctrl{4,8}[_static][_b544]
            parts = n.split("_")
            nch = int(parts[0].replace("skew", "").replace("ctrl", ""))
            bm = next((int(p[1:]) for p in parts if p.startswith("b")
                       and p[1:].isdigit()), 272)
            timed(n, make_skewed(n_chunks=nch, static="static" in parts,
                                 block_m=bm, skew=n.startswith("skew")))
        else:
            timed(n, make_variant(n))


if __name__ == "__main__":
    main()

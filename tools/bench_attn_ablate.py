#!/usr/bin/env python
"""Ablate the int8 self-attention block kernel (r3 perf push).

Trace: self_attn_block = ~107 us/layer. Pure-FLOP floor: 4 int8 dots
(272x1024x1024) x8 batch ~ 52 us + MHA dots ~ 12-24 us + softmax VPU.
Variants isolate: QKVP dots | MHA score/AV dots | softmax chain | quant.

Device-trace timing (wall clocks through the relay lie).
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from text_to_sound_synthesis_tpu.ops.quant import (
    _prologue,
    _quantize_rows,
    quantize_weight,
)
from text_to_sound_synthesis_tpu.ops import int8_block as IB

B, Lp, D, H = 8, 272, 1024, 16
M = B * Lp
ITERS = 100


def make_variant(name):
    import math

    hd = D // H
    scale = 1.0 / math.sqrt(hd)

    def mha(q, k, v, *, do_scores=True, do_softmax=True, do_av=True, gsz=8):
        Lq = q.shape[0]
        Lkv = k.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, Lkv), 1)
        outs = [None] * H
        for g in range(0, H, gsz):
            hs = range(g, min(g + gsz, H))
            if do_scores:
                scores = []
                for h in hs:
                    sl = slice(h * hd, (h + 1) * hd)
                    s = jax.lax.dot_general(q[:, sl], k[:, sl],
                                            (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32) * scale
                    scores.append(s)
                s_all = jnp.concatenate(scores, axis=0)
            else:
                s_all = jnp.broadcast_to(q[:, :1], (len(hs) * Lq, Lkv)).astype(jnp.float32)
            if do_softmax:
                s_all = jnp.where(col >= Lp - 7, -jnp.inf, s_all)
                m = jnp.max(s_all, axis=-1, keepdims=True)
                p = jnp.exp(s_all - m)
                p = (p / jnp.sum(p, axis=-1, keepdims=True))
            else:
                p = s_all * 0.001
            p = p.astype(v.dtype)
            for j, h in enumerate(hs):
                sl = slice(h * hd, (h + 1) * hd)
                if do_av:
                    outs[h] = jnp.dot(p[j * Lq:(j + 1) * Lq, :], v[:, sl],
                                      preferred_element_type=jnp.float32)
                else:
                    outs[h] = p[j * Lq:(j + 1) * Lq, :hd].astype(jnp.float32)
        return jnp.concatenate(outs, axis=1)

    def kernel(x_ref, mod_ref, wq_ref, wk_ref, wv_ref, wp_ref,
               sq_ref, sk_ref, sv_ref, sp_ref,
               bq_ref, bk_ref, bv_ref, bp_ref, out_ref):
        def deq(acc, s, sc, b):
            return acc.astype(jnp.float32) * (s * sc[0:1, :]) + b[0:1, :]

        x = x_ref[:, :].astype(jnp.float32)
        h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                      mod_ref[1:2, :].astype(jnp.float32), "adaln")
        qx, s = _quantize_rows(h)
        if name == "qkvp_dots_only":
            q = deq(jnp.dot(qx, wq_ref[:, :], preferred_element_type=jnp.int32),
                    s, sq_ref, bq_ref)
            k = deq(jnp.dot(qx, wk_ref[:, :], preferred_element_type=jnp.int32),
                    s, sk_ref, bk_ref)
            v = deq(jnp.dot(qx, wv_ref[:, :], preferred_element_type=jnp.int32),
                    s, sv_ref, bv_ref)
            y = (q + k + v).astype(jnp.bfloat16)
        else:
            q = deq(jnp.dot(qx, wq_ref[:, :], preferred_element_type=jnp.int32),
                    s, sq_ref, bq_ref).astype(jnp.bfloat16)
            k = deq(jnp.dot(qx, wk_ref[:, :], preferred_element_type=jnp.int32),
                    s, sk_ref, bk_ref).astype(jnp.bfloat16)
            v = deq(jnp.dot(qx, wv_ref[:, :], preferred_element_type=jnp.int32),
                    s, sv_ref, bv_ref).astype(jnp.bfloat16)
            kw = dict(do_scores=True, do_softmax=True, do_av=True)
            if name == "no_softmax":
                kw["do_softmax"] = False
            elif name == "no_av":
                kw["do_av"] = False
            elif name == "no_scores":
                kw["do_scores"] = False
            elif name == "group16":
                kw["gsz"] = 16
            elif name == "group4":
                kw["gsz"] = 4
            y = mha(q, k, v, **kw).astype(jnp.bfloat16)
        qy, sy = _quantize_rows(y.astype(jnp.float32))
        o = deq(jnp.dot(qy, wp_ref[:, :], preferred_element_type=jnp.int32),
                sy, sp_ref, bp_ref) + x
        out_ref[:, :] = o.astype(out_ref.dtype)

    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((Lp, D), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def f(x, mod, *wsb):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
            grid_spec=pl.GridSpec(
                grid=(B,),
                in_specs=[row,
                          pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                          mat, mat, mat, mat,
                          vec, vec, vec, vec, vec, vec, vec, vec],
                out_specs=row,
            ),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        )(x, mod, *wsb)

    return f


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    x = jax.random.normal(jax.random.PRNGKey(0), (M, D), jnp.bfloat16)
    mod = jnp.stack([jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32)])
    ws = [quantize_weight(jax.random.normal(jax.random.PRNGKey(i), (D, D)) * 0.02)
          for i in range(4)]
    args = ([w.w_q for w in ws] + [w.scale for w in ws] + [w.bias for w in ws])

    def timed(name, fn):
        from text_to_sound_synthesis_tpu.utils.trace import DeviceTrace

        @jax.jit
        def run(x):
            def body(h, _):
                return fn(h, mod, *args), ()
            return jax.lax.scan(body, x, length=ITERS)[0]

        try:
            out = run(x)
            _ = np.asarray(out).ravel()[:2]
            tr = DeviceTrace.capture(
                lambda: np.asarray(run(x)).ravel()[:2],
                f"/tmp/t2s_attn_ablate/{name}")
            rows = [(v, k) for k, (v, _) in tr.by_name()
                    if "closed_call" in k]
            us, which = max(rows)
            dt = us / ITERS
        except Exception as e:  # noqa: BLE001
            print(f"  {name:20s} FAILED {type(e).__name__}: {str(e)[:110]}")
            return
        print(f"  {name:20s} {dt:8.1f} us/iter (device)")

    names = sys.argv[1:] or ["full", "qkvp_dots_only", "no_softmax", "no_av",
                             "no_scores"]
    print(f"self-attn block B={B} Lp={Lp} D={D} H={H}, {ITERS} chained iters")
    for n in names:
        if n == "lib_base":
            timed(n, lambda x, m, *a: IB.self_attn_block(
                x, m, *ws, batch=B, n_head=H, q_valid=Lp - 7))
        elif n == "lib_static":
            timed(n, lambda x, m, *a: IB.self_attn_block(
                x, m, *ws, batch=B, n_head=H, q_valid=Lp - 7,
                static_s=(0.05, 0.05)))
        else:
            timed(n, make_variant(n))


if __name__ == "__main__":
    main()

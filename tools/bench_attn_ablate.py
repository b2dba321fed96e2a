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


def mha_pair(q, k, v, kv_valid, n_head, hd, scale, *, fold_denom=True):
    """Pair-packed MHA (VERDICT r3 #2: 'head-blocked score/AV with lane-packed
    heads'): heads 2g,2g+1 live on ONE aligned 128-lane slice, so the pair's
    scores come from ONE (L,128)@(2L,128)^T dot against a masked block-diagonal
    RHS, and the pair's AV from ONE (L,2L)@(2L,128) dot. 16 MXU issues/program
    instead of 32, at 2x the dot FLOPs (the zero blocks). Softmax runs on the
    lane-packed (L, 2L) layout: joint row max (any max is valid for exp
    stability), per-segment sums, divide folded into the (L,128) pair output.
    """
    L = q.shape[0]
    Lkv = k.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (Lkv, 128), 1)
    mA = (lane < hd).astype(k.dtype)
    mB = (lane >= hd).astype(k.dtype)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * Lkv), 1)
    pad = (col2 % Lkv) >= kv_valid
    laneq = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 1)
    outs = []
    for g in range(n_head // 2):
        sl = slice(g * 128, (g + 1) * 128)
        Qg = q[:, sl]
        Kg = k[:, sl]
        Vg = v[:, sl]
        k_rhs = jnp.concatenate([Kg * mA, Kg * mB], axis=0)          # (2L,128)
        s2 = jax.lax.dot_general(Qg, k_rhs, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        s2 = jnp.where(pad, -jnp.inf, s2)                            # (L, 2L)
        m = jnp.max(s2, axis=-1, keepdims=True)
        p = jnp.exp(s2 - m)
        segA = (col2 < Lkv).astype(jnp.float32)
        sumA = jnp.sum(p * segA, axis=-1, keepdims=True)
        sumB = jnp.sum(p, axis=-1, keepdims=True) - sumA
        if not fold_denom:
            den = jnp.where(col2 < Lkv, sumA, sumB)
            p = p / den
        v_rhs = jnp.concatenate([Vg * mA, Vg * mB], axis=0)          # (2L,128)
        o = jnp.dot(p.astype(v.dtype), v_rhs,
                    preferred_element_type=jnp.float32)              # (L,128)
        if fold_denom:
            o = o / jnp.where(laneq < hd, sumA, sumB)
        outs.append(o)
    return jnp.concatenate(outs, axis=1)                             # (L, D)


def mha_pair_qmask(qA, qB, k, v, kv_valid, n_head, hd, scale):
    """Pair-packed MHA, masks folded into the QUERY side (see pair_qmask in
    main): qA/qB are the dequantized q with head-A / head-B lanes already
    zeroed (the mask rides the dequant's existing multiply — no extra VPU
    pass). Per pair g: stack the two masked queries row-wise, one
    (2L,128)@(L,128)^T score dot against the UNMASKED Kg (the zeroed lanes
    kill the cross-head terms), full-width softmax on (2L, L), one
    (2L,L)@(L,128) AV dot against the UNMASKED Vg, then a single lane-select
    combines the two row-blocks' valid halves."""
    L = qA.shape[0]
    Lkv = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Lkv), 1)
    pad = col >= kv_valid
    laneq = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 1)
    outs = []
    for g in range(n_head // 2):
        sl = slice(g * 128, (g + 1) * 128)
        q2 = jnp.concatenate([qA[:, sl], qB[:, sl]], axis=0)         # (2L,128)
        s2 = jax.lax.dot_general(q2, k[:, sl], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        s2 = jnp.where(pad, -jnp.inf, s2)                            # (2L, L)
        m = jnp.max(s2, axis=-1, keepdims=True)
        p = jnp.exp(s2 - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o2 = jnp.dot(p.astype(v.dtype), v[:, sl],
                     preferred_element_type=jnp.float32)             # (2L,128)
        o = jnp.where(laneq < hd, o2[:L], o2[L:])
        outs.append(o)
    return jnp.concatenate(outs, axis=1)                             # (L, D)


def make_variant2(name):
    """Variants needing a different arg layout: qkv_fused takes one (D, 3D)
    weight; pair_* / dots_first reuse the standard layout but restructure the
    kernel body."""
    import math

    hd = D // H
    scale = 1.0 / math.sqrt(hd)

    def kernel(x_ref, mod_ref, wq_ref, wk_ref, wv_ref, wp_ref,
               sq_ref, sk_ref, sv_ref, sp_ref,
               bq_ref, bk_ref, bv_ref, bp_ref, out_ref):
        def deq(acc, s, sc, b):
            return acc.astype(jnp.float32) * (s * sc[0:1, :]) + b[0:1, :]

        x = x_ref[:, :].astype(jnp.float32)
        h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                      mod_ref[1:2, :].astype(jnp.float32), "adaln")
        qx, s = _quantize_rows(h)
        if name == "dots_first":
            # issue all three QKV dots before ANY dequant VPU work: if Mosaic
            # bundles independent VPU ops into the MXU stream, the dequants
            # hide under the k/v dots
            accq = jnp.dot(qx, wq_ref[:, :], preferred_element_type=jnp.int32)
            acck = jnp.dot(qx, wk_ref[:, :], preferred_element_type=jnp.int32)
            accv = jnp.dot(qx, wv_ref[:, :], preferred_element_type=jnp.int32)
            q = deq(accq, s, sq_ref, bq_ref).astype(jnp.bfloat16)
            k = deq(acck, s, sk_ref, bk_ref).astype(jnp.bfloat16)
            v = deq(accv, s, sv_ref, bv_ref).astype(jnp.bfloat16)
            y = IB._mha_inline(q, k, v, H, Lp - 7).astype(jnp.bfloat16)
        elif name == "pair_qmask":
            accq = jnp.dot(qx, wq_ref[:, :], preferred_element_type=jnp.int32)
            k = deq(jnp.dot(qx, wk_ref[:, :], preferred_element_type=jnp.int32),
                    s, sk_ref, bk_ref).astype(jnp.bfloat16)
            v = deq(jnp.dot(qx, wv_ref[:, :], preferred_element_type=jnp.int32),
                    s, sv_ref, bv_ref).astype(jnp.bfloat16)
            # the block-diag masks ride the q dequant's own multiply: scale
            # and bias pre-masked per 128-lane group (lane%128 < hd = head A)
            laneD = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
            mAf = ((laneD % 128) < hd).astype(jnp.float32)
            qA = (accq.astype(jnp.float32) * (s * (sq_ref[0:1, :] * mAf))
                  + bq_ref[0:1, :] * mAf).astype(jnp.bfloat16)
            qB = (accq.astype(jnp.float32) * (s * (sq_ref[0:1, :] * (1 - mAf)))
                  + bq_ref[0:1, :] * (1 - mAf)).astype(jnp.bfloat16)
            y = mha_pair_qmask(qA, qB, k, v, Lp - 7, H, hd,
                               scale).astype(jnp.bfloat16)
        else:  # pair_both / pair_nofold
            q = deq(jnp.dot(qx, wq_ref[:, :], preferred_element_type=jnp.int32),
                    s, sq_ref, bq_ref).astype(jnp.bfloat16)
            k = deq(jnp.dot(qx, wk_ref[:, :], preferred_element_type=jnp.int32),
                    s, sk_ref, bk_ref).astype(jnp.bfloat16)
            v = deq(jnp.dot(qx, wv_ref[:, :], preferred_element_type=jnp.int32),
                    s, sv_ref, bv_ref).astype(jnp.bfloat16)
            y = mha_pair(q, k, v, Lp - 7, H, hd, scale,
                         fold_denom=(name != "pair_nofold")).astype(jnp.bfloat16)
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


def mha_pair_pre(q, kA, kB, vA, vB, kv_valid, n_head, hd, scale):
    """``mha_pair`` with the block-diag masks already folded into the K/V
    dequants (kA/kB/vA/vB are full-width with the other head's lanes zeroed):
    the per-pair mask multiplies disappear; only the row-concats remain."""
    L = q.shape[0]
    Lkv = kA.shape[0]
    col2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * Lkv), 1)
    pad = (col2 % Lkv) >= kv_valid
    laneq = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 1)
    outs = []
    for g in range(n_head // 2):
        sl = slice(g * 128, (g + 1) * 128)
        k_rhs = jnp.concatenate([kA[:, sl], kB[:, sl]], axis=0)      # (2L,128)
        s2 = jax.lax.dot_general(q[:, sl], k_rhs, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        s2 = jnp.where(pad, -jnp.inf, s2)                            # (L, 2L)
        m = jnp.max(s2, axis=-1, keepdims=True)
        p = jnp.exp(s2 - m)
        segA = (col2 < Lkv).astype(jnp.float32)
        sumA = jnp.sum(p * segA, axis=-1, keepdims=True)
        sumB = jnp.sum(p, axis=-1, keepdims=True) - sumA
        v_rhs = jnp.concatenate([vA[:, sl], vB[:, sl]], axis=0)      # (2L,128)
        o = jnp.dot(p.astype(vA.dtype), v_rhs,
                    preferred_element_type=jnp.float32)              # (L,128)
        o = o / jnp.where(laneq < hd, sumA, sumB)
        outs.append(o)
    return jnp.concatenate(outs, axis=1)                             # (L, D)


def make_rows2(static=False, qmask=False, rows=2, pairmode=False,
               pairdeq=False, vmem_mb=0):
    """``rows`` batch rows per program (grid B/rows, block rows*Lp): the QKVP
    dots run at M=rows*272 (fewer weight-switch boundaries, fewer programs),
    with the MHA applied per row-segment to keep batch isolation. Mirrors the
    MLP b544 lever. ``qmask=True`` additionally uses the pair-packed
    query-masked MHA."""
    import math

    from text_to_sound_synthesis_tpu.ops.quant import _quantize_static

    hd = D // H
    scale = 1.0 / math.sqrt(hd)

    def kernel(x_ref, mod_ref, wq_ref, wk_ref, wv_ref, wp_ref,
               sq_ref, sk_ref, sv_ref, sp_ref,
               bq_ref, bk_ref, bv_ref, bp_ref, out_ref):
        def deq(acc, s, sc, b):
            return acc.astype(jnp.float32) * (s * sc[0:1, :]) + b[0:1, :]

        x = x_ref[:, :].astype(jnp.float32)
        h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                      mod_ref[1:2, :].astype(jnp.float32), "adaln")
        qx, s = (_quantize_static(h, 0.05) if static else _quantize_rows(h))
        accq = jnp.dot(qx, wq_ref[:, :], preferred_element_type=jnp.int32)
        acck = jnp.dot(qx, wk_ref[:, :], preferred_element_type=jnp.int32)
        accv = jnp.dot(qx, wv_ref[:, :], preferred_element_type=jnp.int32)
        segs = []
        if pairdeq:
            laneD = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
            mAf = ((laneD % 128) < hd).astype(jnp.float32)
            mBf = 1.0 - mAf

            def deqm(acc, sc, b, mask):
                return (acc.astype(jnp.float32) * (s * (sc[0:1, :] * mask))
                        + b[0:1, :] * mask).astype(jnp.bfloat16)

            q = deq(accq, s, sq_ref, bq_ref).astype(jnp.bfloat16)
            kA = deqm(acck, sk_ref, bk_ref, mAf)
            kB = deqm(acck, sk_ref, bk_ref, mBf)
            vA = deqm(accv, sv_ref, bv_ref, mAf)
            vB = deqm(accv, sv_ref, bv_ref, mBf)
            for r in range(rows):
                sl = slice(r * Lp, (r + 1) * Lp)
                segs.append(mha_pair_pre(q[sl], kA[sl], kB[sl], vA[sl], vB[sl],
                                         Lp - 7, H, hd, scale))
            y = jnp.concatenate(segs, axis=0).astype(jnp.bfloat16)
            qy, sy = (_quantize_static(y.astype(jnp.float32), 0.05) if static
                      else _quantize_rows(y.astype(jnp.float32)))
            o = deq(jnp.dot(qy, wp_ref[:, :], preferred_element_type=jnp.int32),
                    sy, sp_ref, bp_ref) + x
            out_ref[:, :] = o.astype(out_ref.dtype)
            return
        k = deq(acck, s, sk_ref, bk_ref).astype(jnp.bfloat16)
        v = deq(accv, s, sv_ref, bv_ref).astype(jnp.bfloat16)
        if qmask:
            laneD = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
            mAf = ((laneD % 128) < hd).astype(jnp.float32)
            qA = (accq.astype(jnp.float32) * (s * (sq_ref[0:1, :] * mAf))
                  + bq_ref[0:1, :] * mAf).astype(jnp.bfloat16)
            qB = (accq.astype(jnp.float32) * (s * (sq_ref[0:1, :] * (1 - mAf)))
                  + bq_ref[0:1, :] * (1 - mAf)).astype(jnp.bfloat16)
            for r in range(rows):
                sl = slice(r * Lp, (r + 1) * Lp)
                segs.append(mha_pair_qmask(qA[sl], qB[sl], k[sl], v[sl],
                                           Lp - 7, H, hd, scale))
        else:
            q = deq(accq, s, sq_ref, bq_ref).astype(jnp.bfloat16)
            for r in range(rows):
                sl = slice(r * Lp, (r + 1) * Lp)
                if pairmode:
                    segs.append(mha_pair(q[sl], k[sl], v[sl], Lp - 7, H, hd,
                                         scale))
                else:
                    segs.append(IB._mha_inline(q[sl], k[sl], v[sl], H, Lp - 7))
        y = jnp.concatenate(segs, axis=0).astype(jnp.bfloat16)
        qy, sy = (_quantize_static(y.astype(jnp.float32), 0.05) if static
                  else _quantize_rows(y.astype(jnp.float32)))
        o = deq(jnp.dot(qy, wp_ref[:, :], preferred_element_type=jnp.int32),
                sy, sp_ref, bp_ref) + x
        out_ref[:, :] = o.astype(out_ref.dtype)

    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((rows * Lp, D), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def f(x, mod, *wsb):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
            grid_spec=pl.GridSpec(
                grid=(B // rows,),
                in_specs=[row,
                          pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                          mat, mat, mat, mat,
                          vec, vec, vec, vec, vec, vec, vec, vec],
                out_specs=row,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=vmem_mb * 1024 * 1024 if vmem_mb else None),
        )(x, mod, *wsb)

    return f


def make_qkv_fused(ws, static=False):
    """q/k/v from ONE (Lp,D)@(D,3D) int8 dot instead of three (D,D) dots:
    fewer MXU issues and one long weight stream. r1 tried qkv fusion on the
    XLA bf16 path (neutral); this is the in-kernel int8 test."""
    import math

    from text_to_sound_synthesis_tpu.ops.quant import _quantize_static

    hd = D // H
    scale = 1.0 / math.sqrt(hd)
    wqkv = jnp.concatenate([w.w_q for w in ws[:3]], axis=1)       # (D, 3D)
    sqkv = jnp.concatenate([w.scale for w in ws[:3]], axis=1)     # (1, 3D)
    bqkv = jnp.concatenate([w.bias for w in ws[:3]], axis=1)
    wp = ws[3]

    def kernel(x_ref, mod_ref, wqkv_ref, wp_ref, sqkv_ref, sp_ref,
               bqkv_ref, bp_ref, out_ref):
        x = x_ref[:, :].astype(jnp.float32)
        h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                      mod_ref[1:2, :].astype(jnp.float32), "adaln")
        qx, s = (_quantize_static(h, 0.05) if static else _quantize_rows(h))
        acc = jnp.dot(qx, wqkv_ref[:, :], preferred_element_type=jnp.int32)
        qkv = (acc.astype(jnp.float32) * (s * sqkv_ref[0:1, :])
               + bqkv_ref[0:1, :]).astype(jnp.bfloat16)
        y = IB._mha_inline(qkv[:, 0:D], qkv[:, D:2 * D], qkv[:, 2 * D:3 * D],
                           H, Lp - 7).astype(jnp.bfloat16)
        qy, sy = (_quantize_static(y.astype(jnp.float32), 0.05) if static
                  else _quantize_rows(y.astype(jnp.float32)))
        acc2 = jnp.dot(qy, wp_ref[:, :], preferred_element_type=jnp.int32)
        o = acc2.astype(jnp.float32) * (sy * sp_ref[0:1, :]) + bp_ref[0:1, :] + x
        out_ref[:, :] = o.astype(out_ref.dtype)

    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec3 = pl.BlockSpec((1, 3 * D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((Lp, D), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def f(x, mod, *_ignored):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
            grid_spec=pl.GridSpec(
                grid=(B,),
                in_specs=[row,
                          pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                          pl.BlockSpec((D, 3 * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                          pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                          vec3, vec, vec3, vec],
                out_specs=row,
            ),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        )(x, mod, wqkv, wp.w_q, sqkv, wp.scale, bqkv, wp.bias)

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
        elif n in ("pair_both", "pair_nofold", "pair_qmask", "dots_first"):
            timed(n, make_variant2(n))
        elif n in ("qkv_fused", "qkv_fused_static"):
            timed(n, make_qkv_fused(ws, static=n.endswith("static")))
        elif n.startswith("rows"):
            # rows{2,4}[_static][_qmask][_pair][_v{vmem_mb}]
            parts = n.split("_")
            vmem = next((int(p[1:]) for p in parts
                         if p.startswith("v") and p[1:].isdigit()), 0)
            timed(n, make_rows2(static="static" in parts,
                                qmask="qmask" in parts,
                                pairmode="pair" in parts,
                                pairdeq="pairdeq" in parts,
                                rows=int(parts[0].replace("rows", "")),
                                vmem_mb=vmem))
        else:
            timed(n, make_variant(n))


if __name__ == "__main__":
    main()

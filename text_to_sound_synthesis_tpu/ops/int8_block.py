"""Block-level int8 Pallas kernels: one kernel per transformer sub-block.

The per-dense kernels (ops/quant.py) still round-trip every intermediate
activation through HBM — 8 kernel boundaries per layer ≈ 2 GB/step at
flagship scale — and the attention softmax runs un-overlapped. These three
kernels fuse each sub-block of the denoiser's SelfCrossBlock
(models/diffusion/backbone.py; reference ``transformer_utils.py:168-272``)
end to end in VMEM:

  self_attn_block:  AdaLN -> quant -> q/k/v int8 dots -> MHA (f32 softmax,
                    all-head scores batched for full-lane VPU) -> quant ->
                    proj int8 dot -> +residual
  cross_attn_block: AdaLN -> quant -> q int8 dot -> MHA vs precomputed
                    cond K/V -> quant -> proj int8 dot -> +residual
  mlp_block:        LN -> quant -> fc1 int8 dot -> GELU2 -> quant ->
                    fc2 int8 dot -> +residual

Per layer: 3 kernel boundaries (x in / x out), weights VMEM-resident across
the row-block grid. Quantization is exact per-token dynamic (row abs-max) —
identical math to ops/quant.py, oracle-tested against the jnp twins here.

Grid notes: attention kernels run one program per batch element (a program
needs all of its sequence); the MLP kernel is row-wise and uses finer blocks.
Sequence padding: pad KEYS are masked with -inf; pad query rows compute
garbage that callers drop.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import (QuantizedWeight, _gelu2, _prologue, _quantize_rows,
                    _quantize_static)

__all__ = [
    "self_attn_block",
    "cross_attn_block",
    "attn_pair_block",
    "mlp_block",
    "mlp_block_chunked",
    "mlp_block_streamed",
    "self_attn_block_reference",
    "cross_attn_block_reference",
    "attn_pair_block_reference",
    "mlp_block_reference",
    "mlp_chunked_reference",
]


def _deq(acc, s_row, scale_ref, bias_ref):
    return acc.astype(jnp.float32) * (s_row * scale_ref[0:1, :]) + bias_ref[0:1, :]


def _quant(h, s_static):
    """Dynamic per-row quantize, or static per-tensor when a calibrated
    Python-float scale is provided (deletes the abs-max VPU pass — the
    static-quant serving mode, docs/ROOFLINE.md)."""
    if s_static is None:
        return _quantize_rows(h)
    return _quantize_static(h, s_static)


def _int8_dot(q, w_ref):
    return jnp.dot(q, w_ref[:, :], preferred_element_type=jnp.int32)


def _unpack_w4(p):
    """Nibble-packed (K/2, N) int8 -> (lo, hi) int8 pair ((K/2, N) each).

    Shifts run in int32: int8 shifts (and a direct int4 MXU operand, and even
    XLA ``astype(int4)``) all crash this toolchain — see docs/ROOFLINE.md
    round 5. Sign extension via shift-left-28 / arithmetic-shift-right-28."""
    p32 = p.astype(jnp.int32)
    hi = jax.lax.shift_right_arithmetic(p32, 4)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 28), 28)
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def _int8_dot_w4(q, wp_ref):
    """W4A8 dot: unpack the nibble-packed weight VMEM tile to int8 on the VPU,
    then two half-K int8 MXU dots. lo holds w[:K/2], hi holds w[K/2:]."""
    lo, hi = _unpack_w4(wp_ref[:, :])
    kh = wp_ref.shape[0]
    return (jnp.dot(q[:, :kh], lo, preferred_element_type=jnp.int32)
            + jnp.dot(q[:, kh:], hi, preferred_element_type=jnp.int32))


def _dot(q, w_ref, w4: bool):
    return _int8_dot_w4(q, w_ref) if w4 else _int8_dot(q, w_ref)


import os as _os

_HEAD_GROUP = int(_os.environ.get("T2S_HEAD_GROUP", "8"))


def _par_params(vmem_mb: int = 0, semantics=("parallel",)):
    """Grid iterations in every kernel here are independent (row blocks /
    batch elements) — tell Mosaic so it can pipeline across grid steps.
    Kernels with a sequential accumulation dimension pass their own
    ``semantics`` tuple (e.g. the streamed MLP's ("parallel", "arbitrary")).

    ``vmem_mb`` > 0 lifts the compiler's conservative 16 MiB scoped-vmem
    default for THAT kernel only (v5e has 128 MiB physical): the r4
    pair-packed attention kernel at 2 rows/program peaks at 16.27 MiB in the
    full-sampler context (fit standalone; the while-loop context shaves the
    margin). Raising the limit globally is NOT free — it changes Mosaic's
    buffering decisions (r4 A/B: the chunked-b544 MLP regressed 117 -> 140
    us/layer under a blanket 32 MiB limit), so each kernel opts in;
    T2S_VMEM_LIMIT_MB overrides the opted-in value."""
    limit = None
    if vmem_mb:
        limit = int(_os.environ.get("T2S_VMEM_LIMIT_MB", str(vmem_mb)))
        limit *= 1024 * 1024
    if _os.environ.get("T2S_PAR_SEMANTICS", "1") == "0":
        return pltpu.CompilerParams(vmem_limit_bytes=limit)
    return pltpu.CompilerParams(dimension_semantics=semantics,
                                vmem_limit_bytes=limit)


def _mha_inline_int8(q, k, v, n_head: int, kv_valid: int,
                     head_group: int = _HEAD_GROUP):
    """Int8 twin of ``_mha_inline``: QK^T and AV run as int8 MXU dots.

    Factorization notes: q/k are per-ROW quantized over the full model dim —
    a row scale is valid for any column (head) slice, so one quantize serves
    all heads. P is per-row quantized post-softmax; V per-COLUMN, so
    (P V)_{ij} dequantizes as int32 * (sp_i * sv_j). Softmax stays f32.
    Opt-in via T2S_ATTN_INT8=1; accuracy covered by the oracle tests and the
    drift gate (scores gain ~1e-2 relative noise from 8-bit logits).

    r3 A/B (v5e-1 trace): REGRESSION in context — 6183 -> 7260 us/step. The
    three extra VPU quantize passes (q, k rows; p per group; v columns) cost
    more than the K=64/N=64 int8 dots save; the step is VPU-pass-bound, not
    MXU-rate-bound (tools/bench_mlp_ablate.py tells the same story for the
    MLP). Kept as the documented negative for VERDICT r2 #1(b).
    """
    Lq, D = q.shape
    Lkv = k.shape[0]
    hd = D // n_head
    scale = 1.0 / math.sqrt(hd)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Lkv), 1)
    gsz = min(head_group, n_head)

    qq, sq = _quantize_rows(q.astype(jnp.float32))          # (Lq, D), (Lq, 1)
    kq, sk = _quantize_rows(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    sv = jnp.maximum(jnp.max(jnp.abs(vf), axis=0, keepdims=True), 1e-8) / 127.0
    vq = jnp.clip(jnp.round(vf / sv), -127, 127).astype(jnp.int8)  # (Lkv, D)

    outs = [None] * n_head
    for g in range(0, n_head, gsz):
        hs = range(g, min(g + gsz, n_head))
        scores = []
        for h in hs:
            sl = slice(h * hd, (h + 1) * hd)
            acc = jax.lax.dot_general(qq[:, sl], kq[:, sl],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            scores.append(acc.astype(jnp.float32) * (sq * sk[:, 0][None, :]))
        s_all = jnp.concatenate(scores, axis=0) * scale      # (gsz*Lq, Lkv)
        s_all = jnp.where(col >= kv_valid, -jnp.inf, s_all)
        m = jnp.max(s_all, axis=-1, keepdims=True)
        p = jnp.exp(s_all - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pq, sp = _quantize_rows(p)                           # (gsz*Lq, Lkv)
        for j, h in enumerate(hs):
            sl = slice(h * hd, (h + 1) * hd)
            ph = pq[j * Lq:(j + 1) * Lq, :]
            acc = jnp.dot(ph, vq[:, sl], preferred_element_type=jnp.int32)
            outs[h] = acc.astype(jnp.float32) * (sp[j * Lq:(j + 1) * Lq] * sv[:, sl])
    return jnp.concatenate(outs, axis=1)                     # (Lq, D) f32


_ATTN_INT8 = _os.environ.get("T2S_ATTN_INT8", "0") == "1"


# r3 A/B (v5e-1 trace): folding the div into the AV output was a
# REGRESSION (self_attn 106.7 -> 112.9 us/layer; 16 narrow (272, 64)
# divides waste VPU lanes vs one full-width (2176, 272) pass). Off.
_FOLD_DIV = _os.environ.get("T2S_SOFTMAX_FOLD_DIV", "0") == "1"


def _mha_inline(q, k, v, n_head: int, kv_valid: int, head_group: int = _HEAD_GROUP):
    """(Lq, D) x (Lkv, D) f32/bf16 -> (Lq, D) f32. Head scores are stacked
    along rows in groups of ``head_group`` so the softmax runs on full
    128-lane rows while the f32 score buffer stays within VMEM.

    T2S_SOFTMAX_FOLD_DIV=1 folds the softmax 1/sum into the (Lq, hd)
    AV outputs instead of the (Lq, Lkv) probability matrix — measured
    SLOWER (see _FOLD_DIV note); kept as a documented negative."""
    Lq, D = q.shape
    Lkv = k.shape[0]
    hd = D // n_head
    scale = 1.0 / math.sqrt(hd)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Lkv), 1)
    gsz = min(head_group, n_head)

    outs = [None] * n_head
    for g in range(0, n_head, gsz):
        hs = range(g, min(g + gsz, n_head))
        scores = []
        for h in hs:
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            scores.append(s)
        s_all = jnp.concatenate(scores, axis=0)          # (gsz*Lq, Lkv)
        s_all = jnp.where(col >= kv_valid, -jnp.inf, s_all)
        m = jnp.max(s_all, axis=-1, keepdims=True)
        p = jnp.exp(s_all - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)       # (gsz*Lq, 1) f32
        if not _FOLD_DIV:
            p = p / denom
        p = p.astype(v.dtype)
        for j, h in enumerate(hs):
            sl = slice(h * hd, (h + 1) * hd)
            ph = p[j * Lq:(j + 1) * Lq, :]
            o = jnp.dot(ph, v[:, sl], preferred_element_type=jnp.float32)
            if _FOLD_DIV:
                o = o / denom[j * Lq:(j + 1) * Lq]
            outs[h] = o
    return jnp.concatenate(outs, axis=1)                 # (Lq, D) f32


def _mha(q, k, v, n_head: int, kv_valid: int):
    if _ATTN_INT8:
        return _mha_inline_int8(q, k, v, n_head, kv_valid)
    return _mha_inline(q, k, v, n_head, kv_valid)


def _pair_ok(n_head: int, hd: int) -> bool:
    """Pair-packed MHA needs two heads per aligned 128-lane group."""
    return n_head % 2 == 0 and 2 * hd == 128


def _mha_pair_premasked(q, kA, kB, vA, vB, n_head: int, kv_valid: int):
    """Pair-packed MHA with the block-diagonal masks pre-folded into the K/V
    dequants (r4 A/B, tools/bench_attn_ablate.py `rows2_static_pairdeq`):
    heads 2g, 2g+1 share one aligned 128-lane group; kA/vA have head-B lanes
    zeroed and vice versa, so the pair's scores come from ONE
    (L,128)@(2Lkv,128)^T dot (the zero lanes kill the cross-head terms) and
    the pair's AV from ONE (L,2Lkv)@(2Lkv,128) dot — 16 MXU issues per
    program instead of 32. Softmax runs on the lane-packed (L, 2Lkv) layout:
    a joint row max (any finite shift is valid for exp), per-segment sums,
    the divide folded into the (L,128) pair output. Exact softmax math —
    oracle-tested in tests/test_int8_blocks.py."""
    L, D = q.shape
    Lkv = kA.shape[0]
    hd = D // n_head
    scale = 1.0 / math.sqrt(hd)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * Lkv), 1)
    pad = (col2 % Lkv) >= kv_valid
    segA = (col2 < Lkv).astype(jnp.float32)
    laneq = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 1)
    outs = []
    for g in range(n_head // 2):
        sl = slice(g * 128, (g + 1) * 128)
        k_rhs = jnp.concatenate([kA[:, sl], kB[:, sl]], axis=0)   # (2Lkv,128)
        s2 = jax.lax.dot_general(q[:, sl], k_rhs, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        s2 = jnp.where(pad, -jnp.inf, s2)                         # (L, 2Lkv)
        m = jnp.max(s2, axis=-1, keepdims=True)
        p = jnp.exp(s2 - m)
        sumA = jnp.sum(p * segA, axis=-1, keepdims=True)
        sumB = jnp.sum(p, axis=-1, keepdims=True) - sumA
        v_rhs = jnp.concatenate([vA[:, sl], vB[:, sl]], axis=0)   # (2Lkv,128)
        o = jnp.dot(p.astype(vA.dtype), v_rhs,
                    preferred_element_type=jnp.float32)           # (L,128)
        o = o / jnp.where(laneq < hd, sumA, sumB)
        outs.append(o)
    return jnp.concatenate(outs, axis=1)                          # (L, D) f32


def _mha_pair(q, k, v, n_head: int, kv_valid: int):
    """Pair-packed MHA with the block-diagonal masks applied in-kernel to the
    per-pair K/V slices. Used on the cross-attention path, where Lkv (the
    padded cond length, ~80) is small enough that the 2x(Lkv,128) mask
    multiplies per pair are negligible and the cond K/V enter the kernel
    pre-computed (no dequant to fold the mask into)."""
    L, D = q.shape
    Lkv = k.shape[0]
    hd = D // n_head
    lane = jax.lax.broadcasted_iota(jnp.int32, (Lkv, 128), 1)
    mA = (lane < hd).astype(k.dtype)
    mB = (lane >= hd).astype(k.dtype)
    scale = 1.0 / math.sqrt(hd)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * Lkv), 1)
    pad = (col2 % Lkv) >= kv_valid
    segA = (col2 < Lkv).astype(jnp.float32)
    laneq = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 1)
    outs = []
    for g in range(n_head // 2):
        sl = slice(g * 128, (g + 1) * 128)
        Kg = k[:, sl]
        Vg = v[:, sl]
        k_rhs = jnp.concatenate([Kg * mA, Kg * mB], axis=0)       # (2Lkv,128)
        s2 = jax.lax.dot_general(q[:, sl], k_rhs, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        s2 = jnp.where(pad, -jnp.inf, s2)
        m = jnp.max(s2, axis=-1, keepdims=True)
        p = jnp.exp(s2 - m)
        sumA = jnp.sum(p * segA, axis=-1, keepdims=True)
        sumB = jnp.sum(p, axis=-1, keepdims=True) - sumA
        v_rhs = jnp.concatenate([Vg * mA, Vg * mB], axis=0)
        o = jnp.dot(p.astype(v.dtype), v_rhs,
                    preferred_element_type=jnp.float32)
        o = o / jnp.where(laneq < hd, sumA, sumB)
        outs.append(o)
    return jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# self-attention block
# ---------------------------------------------------------------------------

def _self_attn_kernel(x_ref, mod_ref,
                      wq_ref, wk_ref, wv_ref, wp_ref,
                      sq_ref, sk_ref, sv_ref, sp_ref,
                      bq_ref, bk_ref, bv_ref, bp_ref,
                      out_ref, *, n_head: int, q_valid: int, static_s=None,
                      rows: int = 1, pair: bool = False, w4: bool = False):
    s_in, s_out = static_s if static_s is not None else (None, None)
    x = x_ref[:, :].astype(jnp.float32)
    h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                  mod_ref[1:2, :].astype(jnp.float32), "adaln")
    qx, s = _quant(h, s_in)
    Lp = x_ref.shape[0] // rows
    if pair:
        # block-diag masks folded into the K/V dequants (mask rides the
        # dequant's own multiply-add — no extra VPU pass over K/V)
        D = x_ref.shape[1]
        hd = D // n_head
        laneD = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
        mAf = ((laneD % 128) < hd).astype(jnp.float32)
        mBf = 1.0 - mAf
        accq = _dot(qx, wq_ref, w4)
        acck = _dot(qx, wk_ref, w4)
        accv = _dot(qx, wv_ref, w4)
        q = _deq(accq, s, sq_ref, bq_ref).astype(jnp.bfloat16)
        kA = (acck.astype(jnp.float32) * (s * (sk_ref[0:1, :] * mAf))
              + bk_ref[0:1, :] * mAf).astype(jnp.bfloat16)
        kB = (acck.astype(jnp.float32) * (s * (sk_ref[0:1, :] * mBf))
              + bk_ref[0:1, :] * mBf).astype(jnp.bfloat16)
        vA = (accv.astype(jnp.float32) * (s * (sv_ref[0:1, :] * mAf))
              + bv_ref[0:1, :] * mAf).astype(jnp.bfloat16)
        vB = (accv.astype(jnp.float32) * (s * (sv_ref[0:1, :] * mBf))
              + bv_ref[0:1, :] * mBf).astype(jnp.bfloat16)
        segs = [_mha_pair_premasked(q[r * Lp:(r + 1) * Lp],
                                    kA[r * Lp:(r + 1) * Lp],
                                    kB[r * Lp:(r + 1) * Lp],
                                    vA[r * Lp:(r + 1) * Lp],
                                    vB[r * Lp:(r + 1) * Lp],
                                    n_head, q_valid) for r in range(rows)]
    else:
        q = _deq(_dot(qx, wq_ref, w4), s, sq_ref, bq_ref).astype(jnp.bfloat16)
        k = _deq(_dot(qx, wk_ref, w4), s, sk_ref, bk_ref).astype(jnp.bfloat16)
        v = _deq(_dot(qx, wv_ref, w4), s, sv_ref, bv_ref).astype(jnp.bfloat16)
        segs = [_mha(q[r * Lp:(r + 1) * Lp], k[r * Lp:(r + 1) * Lp],
                     v[r * Lp:(r + 1) * Lp], n_head, q_valid)
                for r in range(rows)]
    y = (segs[0] if rows == 1 else jnp.concatenate(segs, axis=0)).astype(jnp.bfloat16)
    qy, sy = _quant(y.astype(jnp.float32), s_out)
    o = _deq(_dot(qy, wp_ref, w4), sy, sp_ref, bp_ref) + x
    out_ref[:, :] = o.astype(out_ref.dtype)


def self_attn_block(x, mod, wq, wk, wv, wproj, *, batch: int, n_head: int,
                    q_valid: int, interpret: bool = False, static_s=None,
                    rows_per_program: int = 1, mha_mode: str = "base",
                    w4: bool = False):
    """x (B*Lp, D) bf16 -> x + proj(MHA(adaln(x))) in one kernel.

    ``static_s``: optional (s_in, s_out) calibrated Python-float activation
    scales; when given, both quantize sites use static per-tensor scales
    (no abs-max pass).

    ``rows_per_program``: batch rows handled by one grid program. More rows
    = fewer, larger QKVP dots and fewer program boundaries (r4 A/B: 2 rows
    at flagship, self_attn 105.5 -> 101.7 us/layer; 4 rows exceeds the
    compile limits). MHA stays per-row (batch isolation).

    ``mha_mode``: "base" (head-grouped row-stacked softmax) or "pair"
    (pair-packed heads, masks folded into the K/V dequants — r4 A/B: with
    rows_per_program=2, 105.5 -> 93.6 us/layer). "pair" requires two heads
    per 128-lane group (head_dim 64); asserted here.

    ``w4``: the weights are nibble-packed int4 ((D/2, D) buffers from
    ``quantize_weight_w4``) — halved HBM weight stream, in-kernel VPU unpack
    (see docs/ROOFLINE.md round 5 for the measured trade)."""
    M, D = x.shape
    assert batch % rows_per_program == 0, (batch, rows_per_program)
    pair = mha_mode == "pair"
    assert not pair or _pair_ok(n_head, D // n_head), (n_head, D)
    Lp = M // batch
    blk = Lp * rows_per_program
    Kw = D // 2 if w4 else D
    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((Kw, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_self_attn_kernel, n_head=n_head, q_valid=q_valid,
                static_s=static_s, rows=rows_per_program, pair=pair, w4=w4),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(batch // rows_per_program,),
            in_specs=[row,
                      pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                      mat, mat, mat, mat,
                      vec, vec, vec, vec,
                      vec, vec, vec, vec],
            out_specs=row,
        ),
        compiler_params=_par_params(24 if (pair or rows_per_program > 1) else 0),
        interpret=interpret,
    )(x, mod, wq.w_q, wk.w_q, wv.w_q, wproj.w_q,
      wq.scale, wk.scale, wv.scale, wproj.scale,
      wq.bias, wk.bias, wv.bias, wproj.bias)


# ---------------------------------------------------------------------------
# cross-attention block
# ---------------------------------------------------------------------------

def _cross_attn_kernel(x_ref, mod_ref, ck_ref, cv_ref,
                       wq_ref, wp_ref, sq_ref, sp_ref, bq_ref, bp_ref,
                       out_ref, *, n_head: int, kv_valid: int, static_s=None,
                       rows: int = 1, pair: bool = False, w4: bool = False):
    s_in, s_out = static_s if static_s is not None else (None, None)
    x = x_ref[:, :].astype(jnp.float32)
    h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                  mod_ref[1:2, :].astype(jnp.float32), "adaln")
    qx, s = _quant(h, s_in)
    q = _deq(_dot(qx, wq_ref, w4), s, sq_ref, bq_ref).astype(jnp.bfloat16)
    Lp = x_ref.shape[0] // rows
    Skv = ck_ref.shape[0] // rows
    mha = _mha_pair if pair else _mha
    segs = [mha(q[r * Lp:(r + 1) * Lp],
                ck_ref[r * Skv:(r + 1) * Skv, :],
                cv_ref[r * Skv:(r + 1) * Skv, :], n_head, kv_valid)
            for r in range(rows)]
    y = segs[0] if rows == 1 else jnp.concatenate(segs, axis=0)
    qy, sy = _quant(y.astype(jnp.bfloat16).astype(jnp.float32), s_out)
    o = _deq(_dot(qy, wp_ref, w4), sy, sp_ref, bp_ref) + x
    out_ref[:, :] = o.astype(out_ref.dtype)


def cross_attn_block(x, mod, ck, cv, wq, wproj, *, batch: int, n_head: int,
                     kv_valid: int, interpret: bool = False, static_s=None,
                     rows_per_program: int = 1, mha_mode: str = "base",
                     w4: bool = False):
    """x (B*Lp, D); ck/cv (B*Skv, D) bf16 flat cond K/V. ``static_s``:
    optional (s_in, s_out) calibrated static activation scales.

    ``rows_per_program`` / ``mha_mode``: see ``self_attn_block``. Here
    "pair" masks the per-pair K/V slices in-kernel (the cond K/V arrive
    pre-computed — nothing to fold the masks into — but Lkv is the short
    padded cond length, so the mask multiplies are negligible)."""
    M, D = x.shape
    assert batch % rows_per_program == 0, (batch, rows_per_program)
    pair = mha_mode == "pair"
    assert not pair or _pair_ok(n_head, D // n_head), (n_head, D)
    Lp = M // batch
    Skv = ck.shape[0] // batch
    blk = Lp * rows_per_program
    kvblk = Skv * rows_per_program
    Kw = D // 2 if w4 else D
    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((Kw, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kvrow = pl.BlockSpec((kvblk, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_cross_attn_kernel, n_head=n_head, kv_valid=kv_valid,
                static_s=static_s, rows=rows_per_program, pair=pair, w4=w4),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(batch // rows_per_program,),
            in_specs=[row,
                      pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                      kvrow, kvrow,
                      mat, mat, vec, vec, vec, vec],
            out_specs=row,
        ),
        compiler_params=_par_params(24 if (pair or rows_per_program > 1) else 0),
        interpret=interpret,
    )(x, mod, ck, cv, wq.w_q, wproj.w_q, wq.scale, wproj.scale, wq.bias, wproj.bias)


# ---------------------------------------------------------------------------
# merged self+cross attention block (one kernel per layer's attention half)
# ---------------------------------------------------------------------------

def _attn_pair_kernel(x_ref, mods_ref, ck_ref, cv_ref,
                      wq_ref, wk_ref, wv_ref, wp_ref, cq_ref, cp_ref,
                      sq_ref, sk_ref, sv_ref, sp_ref, scq_ref, scp_ref,
                      bq_ref, bk_ref, bv_ref, bp_ref, bcq_ref, bcp_ref,
                      out_ref, *, n_head: int, q_valid: int, kv_valid: int,
                      static_s=None):
    s_in, s_out, s2_in, s2_out = (static_s if static_s is not None
                                  else (None, None, None, None))
    x = x_ref[:, :].astype(jnp.float32)
    # self-attention sub-block
    h = _prologue(x, mods_ref[0:1, :].astype(jnp.float32),
                  mods_ref[1:2, :].astype(jnp.float32), "adaln")
    qx, s = _quant(h, s_in)
    q = _deq(_int8_dot(qx, wq_ref), s, sq_ref, bq_ref).astype(jnp.bfloat16)
    k = _deq(_int8_dot(qx, wk_ref), s, sk_ref, bk_ref).astype(jnp.bfloat16)
    v = _deq(_int8_dot(qx, wv_ref), s, sv_ref, bv_ref).astype(jnp.bfloat16)
    y = _mha(q, k, v, n_head, q_valid).astype(jnp.bfloat16)
    qy, sy = _quant(y.astype(jnp.float32), s_out)
    x = _deq(_int8_dot(qy, wp_ref), sy, sp_ref, bp_ref) + x
    # cross-attention sub-block (x never leaves VMEM between the two)
    h2 = _prologue(x, mods_ref[2:3, :].astype(jnp.float32),
                   mods_ref[3:4, :].astype(jnp.float32), "adaln")
    q2x, s2 = _quant(h2, s2_in)
    q2 = _deq(_int8_dot(q2x, cq_ref), s2, scq_ref, bcq_ref).astype(jnp.bfloat16)
    y2 = _mha(q2, ck_ref[:, :], cv_ref[:, :], n_head, kv_valid)
    qy2, sy2 = _quant(y2.astype(jnp.bfloat16).astype(jnp.float32), s2_out)
    x = _deq(_int8_dot(qy2, cp_ref), sy2, scp_ref, bcp_ref) + x
    out_ref[:, :] = x.astype(out_ref.dtype)


def attn_pair_block(x, mods, ck, cv, wq, wk, wv, wproj, wcrossq, wcrossproj, *,
                    batch: int, n_head: int, q_valid: int, kv_valid: int,
                    interpret: bool = False, static_s=None):
    """Self-attention + cross-attention sub-blocks fused into ONE kernel.

    x (B*Lp, D) bf16; mods (4, D) f32 = [self scale; self shift; cross scale;
    cross shift] AdaLN modulations; ck/cv (B*Skv, D) bf16 flat cond K/V.
    Equivalent to ``cross_attn_block(self_attn_block(x, ...), ...)`` with one
    kernel boundary and one HBM round-trip of x instead of two.
    """
    M, D = x.shape
    Lp = M // batch
    Skv = ck.shape[0] // batch
    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((Lp, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kvrow = pl.BlockSpec((Skv, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_attn_pair_kernel, n_head=n_head, q_valid=q_valid,
                kv_valid=kv_valid, static_s=static_s),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(batch,),
            in_specs=[row,
                      pl.BlockSpec((4, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                      kvrow, kvrow,
                      mat, mat, mat, mat, mat, mat,
                      vec, vec, vec, vec, vec, vec,
                      vec, vec, vec, vec, vec, vec],
            out_specs=row,
        ),
        compiler_params=_par_params(),
        interpret=interpret,
    )(x, mods, ck, cv,
      wq.w_q, wk.w_q, wv.w_q, wproj.w_q, wcrossq.w_q, wcrossproj.w_q,
      wq.scale, wk.scale, wv.scale, wproj.scale, wcrossq.scale, wcrossproj.scale,
      wq.bias, wk.bias, wv.bias, wproj.bias, wcrossq.bias, wcrossproj.bias)


def attn_pair_block_reference(x, mods, ck, cv, wq, wk, wv, wproj, wcrossq,
                              wcrossproj, *, batch, n_head, q_valid, kv_valid,
                              static_s=None):
    """jnp oracle: the two single-block references composed."""
    ss, cs = (static_s[:2], static_s[2:]) if static_s is not None else (None, None)
    y = self_attn_block_reference(x, mods[0:2], wq, wk, wv, wproj, batch=batch,
                                  n_head=n_head, q_valid=q_valid, static_s=ss)
    return cross_attn_block_reference(y, mods[2:4], ck, cv, wcrossq, wcrossproj,
                                      batch=batch, n_head=n_head,
                                      kv_valid=kv_valid, static_s=cs)


# ---------------------------------------------------------------------------
# MLP block
# ---------------------------------------------------------------------------

def _mlp_kernel(x_ref, mod_ref, w1_ref, w2_ref, s1_ref, s2_ref, b1_ref, b2_ref,
                out_ref, *, pipeline_halves: bool = False, static_s=None,
                w4: bool = False):
    s_in, s_mid = static_s if static_s is not None else (None, None)

    def half(x):
        h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                      mod_ref[1:2, :].astype(jnp.float32), "ln")
        qx, s = _quant(h, s_in)
        u = _deq(_dot(qx, w1_ref, w4), s, s1_ref, b1_ref)
        u = _gelu2(u)
        qu, su = _quant(u, s_mid)
        return _deq(_dot(qu, w2_ref, w4), su, s2_ref, b2_ref) + x

    if not pipeline_halves:
        out_ref[:, :] = half(x_ref[:, :].astype(jnp.float32)).astype(out_ref.dtype)
        return
    # two independent row halves: exposes VPU(half A) || MXU(half B) to the
    # scheduler instead of one serial LN->quant->dot->gelu->quant->dot chain
    m = x_ref.shape[0] // 2
    out_ref[:m, :] = half(x_ref[:m, :].astype(jnp.float32)).astype(out_ref.dtype)
    out_ref[m:, :] = half(x_ref[m:, :].astype(jnp.float32)).astype(out_ref.dtype)


def mlp_block(x, mod, w1, w2, *, block_m: int = 128, interpret: bool = False,
              pipeline_halves: bool = False, static_s=None, w4: bool = False):
    """x (M, D) -> x + fc2(gelu2(fc1(ln(x)))) in one kernel. Row-wise: any
    block_m dividing M (128 keeps fc1's int32 accumulator + both weights
    comfortably in VMEM). ``static_s``: optional (s_in, s_mid) calibrated
    static activation scales (the mid site covers the (M, 4D) GELU2 output —
    the most expensive abs-max pass in the step, docs/ROOFLINE.md).
    ``w4``: weights are nibble-packed int4 (see ``self_attn_block``)."""
    M, D = x.shape
    # same reads either way: W4 packing halves K in STORAGE, so the stored
    # shape is already (K/2, N) and the BlockSpecs below follow it directly
    Kh1, Dh = w1.w_q.shape
    Kh2 = w2.w_q.shape[0]
    assert M % block_m == 0, (M, block_m)
    return pl.pallas_call(
        partial(_mlp_kernel, pipeline_halves=pipeline_halves,
                static_s=static_s, w4=w4),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(M // block_m,),
            in_specs=[
                pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Kh1, Dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Kh2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_par_params(),
        interpret=interpret,
    )(x, mod, w1.w_q, w2.w_q, w1.scale, w2.scale, w1.bias, w2.bias)


# ---------------------------------------------------------------------------
# MLP block, hidden-dim-chunked variant
# ---------------------------------------------------------------------------

def _mlp_chunked_kernel(x_ref, mod_ref, w1_ref, w2_ref, s1_ref, s2_ref,
                        b1_ref, b2_ref, out_ref, *, n_chunks: int,
                        static_s=None):
    """fc1/gelu/quant/fc2 processed in ``n_chunks`` slices of the hidden dim.

    Why: the serial chain LN -> fc1 -> GELU2+quant -> fc2 leaves the VPU
    epilogue (dequant, sigmoid, abs-max, round on the (M, 4D) intermediate)
    un-overlapped with the MXU. Chunking the hidden dim makes chunk c+1's
    fc1 dot independent of chunk c's epilogue, exposing MXU(c+1) || VPU(c)
    to the Mosaic scheduler, and shrinks the live intermediate from
    (M, 4D) f32 to (M, 4D/n) — enabling much larger row blocks.

    Numerics note: each chunk's rows get their OWN abs-max quant scale
    (group-quantization with group = 4D/n). This is a finer quantization
    than the full-row scale — validated against ``mlp_chunked_reference``
    exactly and against the f32 MLP in tests/test_int8_blocks.py.
    """
    s_in, s_mid = static_s if static_s is not None else (None, None)
    x = x_ref[:, :].astype(jnp.float32)
    h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                  mod_ref[1:2, :].astype(jnp.float32), "ln")
    qx, s = _quant(h, s_in)
    Dh = w1_ref.shape[1]
    ck = Dh // n_chunks
    y = x  # residual folded into the f32 accumulator
    for c in range(n_chunks):
        sl = slice(c * ck, (c + 1) * ck)
        acc1 = jnp.dot(qx, w1_ref[:, sl], preferred_element_type=jnp.int32)
        u = acc1.astype(jnp.float32) * (s * s1_ref[0:1, sl]) + b1_ref[0:1, sl]
        u = _gelu2(u)
        qu, su = _quant(u, s_mid)
        acc2 = jnp.dot(qu, w2_ref[sl, :], preferred_element_type=jnp.int32)
        y = y + acc2.astype(jnp.float32) * (su * s2_ref[0:1, :])
    out_ref[:, :] = (y + b2_ref[0:1, :]).astype(out_ref.dtype)


def mlp_block_chunked(x, mod, w1, w2, *, block_m: int = 544,
                      n_chunks: int = 4, interpret: bool = False,
                      static_s=None):
    """Chunked-hidden-dim twin of ``mlp_block`` (see kernel docstring)."""
    M, D = x.shape
    Dh = w1.w_q.shape[1]
    assert M % block_m == 0, (M, block_m)
    assert Dh % n_chunks == 0, (Dh, n_chunks)
    return pl.pallas_call(
        partial(_mlp_chunked_kernel, n_chunks=n_chunks, static_s=static_s),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(M // block_m,),
            in_specs=[
                pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, Dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Dh, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_par_params(),
        interpret=interpret,
    )(x, mod, w1.w_q, w2.w_q, w1.scale, w2.scale, w1.bias, w2.bias)


# ---------------------------------------------------------------------------
# MLP block, streamed-weights variant (hidden-dim chunks as a GRID dimension)
# ---------------------------------------------------------------------------

def _mlp_streamed_kernel(x_ref, mod_ref, w1_ref, w2_ref, s1_ref, s2_ref,
                         b1_ref, b2_ref, out_ref, qx_ref, sdyn_ref, acc_ref,
                         *, static_s=None):
    """One grid step = one hidden-dim chunk of fc1/GELU2/quant/fc2.

    Why a GRID dimension instead of the in-kernel loop of
    ``_mlp_chunked_kernel``: with the weights as whole-array VMEM blocks
    (constant index maps), Mosaic DMAs the full 8 MB weight set BEFORE the
    first program runs — a serial ~10 us head tax paid once per invocation,
    which is exactly the in-context overhead the r4 trace measured (138
    us/layer in the sampler vs 126 in the back-to-back lib A/B,
    docs/ROOFLINE.md). Making the chunk index a grid dimension turns the
    weight loads into per-step blocks that Mosaic double-buffers under the
    previous chunk's dots, shrinking the serial head to one chunk (~0.5 MB).

    State across chunk steps lives in scratch (persistent for the whole
    pallas_call): the quantized input ``qx`` + its scales (computed once at
    c==0), and the f32 accumulator carrying residual + chunk contributions.
    Numerics: identical to ``mlp_block_chunked`` at the same ``n_chunks``
    (per-chunk mid quant scales; exact-match oracle in
    tests/test_int8_blocks.py).
    """
    s_in, s_mid = static_s if static_s is not None else (None, None)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        x = x_ref[:, :].astype(jnp.float32)
        h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                      mod_ref[1:2, :].astype(jnp.float32), "ln")
        qx, s = _quant(h, s_in)
        qx_ref[:, :] = qx
        if s_in is None:
            sdyn_ref[:, :] = s
        acc_ref[:, :] = x  # residual folded into the accumulator

    s = s_in if s_in is not None else sdyn_ref[:, :]
    u = _deq(_int8_dot(qx_ref[:, :], w1_ref), s, s1_ref, b1_ref)
    u = _gelu2(u)
    qu, su = _quant(u, s_mid)
    acc_ref[:, :] += (_int8_dot(qu, w2_ref).astype(jnp.float32)
                      * (su * s2_ref[0:1, :]))

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        out_ref[:, :] = (acc_ref[:, :] + b2_ref[0:1, :]).astype(out_ref.dtype)


def mlp_block_streamed(x, mod, w1, w2, *, block_m: int = 1088,
                       n_chunks: int = 16, interpret: bool = False,
                       static_s=None):
    """Streamed-weights twin of ``mlp_block_chunked`` (see kernel docstring).

    Grid = (M/block_m, n_chunks) with the chunk dimension minor, so weight
    chunk c+1 prefetches during chunk c's compute. The row dimension is
    parallel; the chunk dimension is sequential ("arbitrary") because it
    accumulates into scratch.
    """
    M, D = x.shape
    Dh = w1.w_q.shape[1]
    assert M % block_m == 0, (M, block_m)
    assert Dh % n_chunks == 0, (Dh, n_chunks)
    ck = Dh // n_chunks
    return pl.pallas_call(
        partial(_mlp_streamed_kernel, static_s=static_s),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid=(M // block_m, n_chunks),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda m, c: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, ck), lambda m, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ck, D), lambda m, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ck), lambda m, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ck), lambda m, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, D), lambda m, c: (m, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_m, D), jnp.int8),      # qx
            pltpu.VMEM((block_m, 1), jnp.float32),   # dynamic row scales
            pltpu.VMEM((block_m, D), jnp.float32),   # f32 accumulator
        ],
        compiler_params=_par_params(
            vmem_mb=24, semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, mod, w1.w_q, w2.w_q, w1.scale, w2.scale, w1.bias, w2.bias)


def mlp_chunked_reference(x, mod, w1, w2, *, n_chunks: int = 4, static_s=None):
    """jnp oracle for ``mlp_block_chunked`` (per-chunk row scales)."""
    s_in, s_mid = static_s if static_s is not None else (None, None)
    xf = x.astype(jnp.float32)
    h = _prologue(xf, mod[0:1].astype(jnp.float32), mod[1:2].astype(jnp.float32),
                  "ln")
    q, s = _quant(h, s_in)
    Dh = w1.w_q.shape[1]
    ck = Dh // n_chunks
    y = xf
    for c in range(n_chunks):
        sl = slice(c * ck, (c + 1) * ck)
        acc1 = jnp.dot(q.astype(jnp.int32), w1.w_q[:, sl].astype(jnp.int32))
        u = acc1.astype(jnp.float32) * (s * w1.scale[:, sl]) + w1.bias[:, sl]
        u = _gelu2(u)
        qu, su = _quant(u, s_mid)
        acc2 = jnp.dot(qu.astype(jnp.int32), w2.w_q[sl, :].astype(jnp.int32))
        y = y + acc2.astype(jnp.float32) * (su * w2.scale)
    return (y + w2.bias).astype(x.dtype)


# ---------------------------------------------------------------------------
# jnp reference twins (test oracles / CPU fallback)
# ---------------------------------------------------------------------------

def _ref_dense(x, w: QuantizedWeight, norm="none", mod=None, s_static=None):
    if norm == "none":
        h = x.astype(jnp.float32)
    else:
        h = _prologue(x.astype(jnp.float32), mod[0:1].astype(jnp.float32),
                      mod[1:2].astype(jnp.float32), norm)
    q, s = _quant(h, s_static)
    acc = jnp.dot(q.astype(jnp.int32), w.w_q.astype(jnp.int32))
    return acc.astype(jnp.float32) * (s * w.scale) + w.bias


def _ref_mha(q, k, v, batch, n_head, kv_valid):
    from .attention import mha_reference

    return mha_reference(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                         v.astype(jnp.bfloat16), batch=batch, n_head=n_head,
                         kv_valid=kv_valid).astype(jnp.float32)


def self_attn_block_reference(x, mod, wq, wk, wv, wproj, *, batch, n_head,
                              q_valid, static_s=None):
    s_in, s_out = static_s if static_s is not None else (None, None)
    xf = x.astype(jnp.float32)
    h = _prologue(xf, mod[0:1].astype(jnp.float32), mod[1:2].astype(jnp.float32),
                  "adaln")
    q_, s = _quant(h, s_in)

    def dense(w):
        acc = jnp.dot(q_.astype(jnp.int32), w.w_q.astype(jnp.int32))
        return (acc.astype(jnp.float32) * (s * w.scale) + w.bias).astype(jnp.bfloat16)

    y = _ref_mha(dense(wq), dense(wk), dense(wv), batch, n_head, q_valid)
    y = y.astype(jnp.bfloat16).astype(jnp.float32)
    qy, sy = _quant(y, s_out)
    acc = jnp.dot(qy.astype(jnp.int32), wproj.w_q.astype(jnp.int32))
    o = acc.astype(jnp.float32) * (sy * wproj.scale) + wproj.bias + xf
    return o.astype(x.dtype)


def cross_attn_block_reference(x, mod, ck, cv, wq, wproj, *, batch, n_head,
                               kv_valid, static_s=None):
    s_in, s_out = static_s if static_s is not None else (None, None)
    xf = x.astype(jnp.float32)
    q = _ref_dense(x, wq, "adaln", mod, s_static=s_in).astype(jnp.bfloat16)
    y = _ref_mha(q, ck, cv, batch, n_head, kv_valid)
    qy, sy = _quant(y.astype(jnp.bfloat16).astype(jnp.float32), s_out)
    acc = jnp.dot(qy.astype(jnp.int32), wproj.w_q.astype(jnp.int32))
    o = acc.astype(jnp.float32) * (sy * wproj.scale) + wproj.bias + xf
    return o.astype(x.dtype)


def mlp_block_reference(x, mod, w1, w2, static_s=None):
    s_in, s_mid = static_s if static_s is not None else (None, None)
    xf = x.astype(jnp.float32)
    u = _gelu2(_ref_dense(x, w1, "ln", mod, s_static=s_in))
    qu, su = _quant(u, s_mid)
    acc = jnp.dot(qu.astype(jnp.int32), w2.w_q.astype(jnp.int32))
    o = acc.astype(jnp.float32) * (su * w2.scale) + w2.bias + xf
    return o.astype(x.dtype)

"""Int8 W8A8 fused dense — the quantized serving path's workhorse op.

One Pallas TPU kernel computes, without ever leaving VMEM:

  [optional LayerNorm / AdaLN(mod)] -> per-token dynamic abs-max int8
  quantization -> int8 x int8 MXU matmul (2x the bf16 rate on v5e) ->
  dequant (row_scale x col_scale) + bias + [optional GELU2] +
  [optional residual] -> bf16 out.

Why fused: a standalone int8 matmul loses its 2x FLOP advantage to the
quantization traffic (the round-trip of f32 scales/casts through HBM measured
performance-neutral in round 1 — CLAUDE.md ledger). Keeping the normalize/
quantize prologue and the dequant/activation epilogue resident in VMEM makes
the HBM traffic *smaller* than the bf16 path (weights are int8) while the MXU
runs at the int8 rate.

Weights are quantized symmetric per-output-channel (``quantize_weight``);
activations symmetric per-row (per token). This is the standard dynamic W8A8
recipe (SmoothQuant-style without the smoothing, which the well-conditioned
denoiser activations do not need).

``quant_dense_reference`` is the jnp twin — identical math, runs anywhere, and
is the test oracle for the kernel.

Used by ``models/diffusion/int8_runtime.py`` (the quantized sampler); the
bf16 path and all training are untouched.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "QuantizedWeight",
    "quantize_weight",
    "quantize_weight_w4",
    "unpack_weight_w4",
    "fused_quant_dense",
    "fused_quant_dense_multi",
    "quant_dense_xla",
    "quant_dense_reference",
]


class QuantizedWeight(NamedTuple):
    """Per-output-channel symmetric int8 weight."""

    w_q: jnp.ndarray      # (K, N) int8
    scale: jnp.ndarray    # (1, N) f32 — dequant multiplier
    bias: jnp.ndarray     # (1, N) f32


def quantize_weight(w: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> QuantizedWeight:
    """(K, N) float weight -> symmetric per-column int8 + f32 scale."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)          # (1, N)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    if bias is None:
        bias = jnp.zeros((1, w.shape[1]), jnp.float32)
    return QuantizedWeight(w_q, scale, bias.reshape(1, -1).astype(jnp.float32))


def quantize_weight_w4(w: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> QuantizedWeight:
    """(K, N) float weight -> symmetric per-column int4, nibble-PACKED.

    W4A8 weight storage (VERDICT r4 #1): halves the HBM weight stream the
    split-calls probe proved irreducible at int8 (docs/ROOFLINE.md round 4).
    ``w_q`` is (K/2, N) int8 where byte[k, n] packs w4[k, n] (low nibble,
    4-bit two's complement) and w4[k + K/2, n] (high nibble) — the split at
    K/2 keeps the unpacked halves contiguous for the kernel's two half-K
    dots. The TPU toolchain has no usable native int4 path (Mosaic int4 dot
    and XLA astype(int4) both crash — round-5 probes), so the kernels unpack
    on the VPU (ops/int8_block.py::_unpack_w4).
    """
    w = w.astype(jnp.float32)
    K = w.shape[0]
    assert K % 2 == 0, K
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)          # (1, N)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    w4 = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int32)
    lo, hi = w4[:K // 2], w4[K // 2:]
    packed = ((hi << 4) | (lo & 0xF)).astype(jnp.int8)
    if bias is None:
        bias = jnp.zeros((1, w.shape[1]), jnp.float32)
    return QuantizedWeight(packed, scale, bias.reshape(1, -1).astype(jnp.float32))


def unpack_weight_w4(w: QuantizedWeight) -> QuantizedWeight:
    """Packed W4 -> plain (K, N) int8 QuantizedWeight (jnp; the oracle/CPU
    twin of the in-kernel unpack — bit-identical values)."""
    p = w.w_q.astype(jnp.int32)
    hi = jax.lax.shift_right_arithmetic(p, 4)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p, 28), 28)
    return QuantizedWeight(jnp.concatenate([lo, hi], axis=0).astype(jnp.int8),
                           w.scale, w.bias)


def _gelu2(x):
    """x * sigmoid(1.702 x) — the reference's GELU2 (transformer_utils.py:111)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _prologue(x, mod_scale, mod_shift, norm: str):
    """LayerNorm variants in f32. mod_* are (1, K) broadcast rows."""
    if norm == "none":
        return x
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    if norm == "adaln":          # LN(no affine) * (1 + scale) + shift
        h = h * (1.0 + mod_scale) + mod_shift
    elif norm == "ln":           # standard affine LN: scale * h + shift
        h = h * mod_scale + mod_shift
    else:
        raise ValueError(norm)
    return h


def _quantize_rows(h):
    """Per-row symmetric int8: returns (int8 values, f32 (rows,1) dequant scale)."""
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
    return q, s


def _quantize_static(h, s: float):
    """Static-scale symmetric int8: ``s`` is a CALIBRATED per-tensor Python
    float baked into the trace, so no abs-max reduction pass runs on the VPU
    (that pass is what per-token dynamic quantization pays per site — see
    docs/ROOFLINE.md). Values beyond ±127·s saturate. Returns (int8 values,
    the scalar dequant scale)."""
    q = jnp.clip(jnp.round(h * (1.0 / s)), -127, 127).astype(jnp.int8)
    return q, s


def _kernel(x_ref, mod_ref, w_ref, scale_ref, bias_ref, res_ref, out_ref,
            *, norm: str, act: str, use_residual: bool, s_static=None):
    x = x_ref[:, :].astype(jnp.float32)
    mod_scale = mod_ref[0:1, :].astype(jnp.float32)
    mod_shift = mod_ref[1:2, :].astype(jnp.float32)
    h = _prologue(x, mod_scale, mod_shift, norm)
    q, s = (_quantize_rows(h) if s_static is None
            else _quantize_static(h, s_static))
    acc = jnp.dot(q, w_ref[:, :], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s * scale_ref[0:1, :]) + bias_ref[0:1, :]
    if act == "gelu2":
        y = _gelu2(y)
    elif act != "none":
        raise ValueError(act)
    if use_residual:
        y = y + res_ref[:, :].astype(jnp.float32)
    out_ref[:, :] = y.astype(out_ref.dtype)


def _pick_bn(n: int) -> int:
    for bn in (512, 256, 128):
        if n % bn == 0:
            return bn
    return n


def fused_quant_dense(
    x: jnp.ndarray,                      # (M, K) bf16/f32
    w: QuantizedWeight,                  # (K, N)
    *,
    norm: str = "none",                  # none | ln | adaln
    mod: Optional[jnp.ndarray] = None,   # (2, K) f32: scale row, shift row
    act: str = "none",                   # none | gelu2
    residual: Optional[jnp.ndarray] = None,   # (M, N)
    block_m: int = 128,
    out_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
    s_static: Optional[float] = None,
) -> jnp.ndarray:
    """Fused (norm -> quant -> int8 matmul -> dequant/bias/act/residual).

    M must already be padded to a multiple of ``block_m`` by the caller (the
    int8 runtime pads the token dim once for the whole network).
    ``s_static``: optional calibrated static activation scale (see
    ``_quantize_static``).
    """
    M, K = x.shape
    Kw, N = w.w_q.shape
    assert K == Kw, (K, Kw)
    assert M % block_m == 0, (M, block_m)
    if norm == "ln" and mod is None:
        raise ValueError("norm='ln' requires mod = (gamma, beta) rows")
    if mod is None:
        mod = jnp.zeros((2, K), jnp.float32)
    use_residual = residual is not None
    if not use_residual:
        residual = jnp.zeros((block_m, N), out_dtype)  # dummy, single block

    bn = _pick_bn(N)
    grid = (M // block_m, N // bn)

    return pl.pallas_call(
        partial(_kernel, norm=norm, act=act, use_residual=use_residual,
                s_static=s_static),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, K), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                (pl.BlockSpec((block_m, bn), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
                 if use_residual else
                 pl.BlockSpec((block_m, bn), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)),
            ],
            out_specs=pl.BlockSpec((block_m, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, mod, w.w_q, w.scale, w.bias, residual)


def _kernel_multi(x_ref, mod_ref, *rest, norm: str, act: str, n_w: int,
                  use_residual: bool, s_static=None):
    w_refs = rest[:n_w]
    scale_refs = rest[n_w:2 * n_w]
    bias_refs = rest[2 * n_w:3 * n_w]
    res_ref = rest[3 * n_w] if use_residual else None
    out_refs = rest[3 * n_w + (1 if use_residual else 0):]

    x = x_ref[:, :].astype(jnp.float32)
    h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                  mod_ref[1:2, :].astype(jnp.float32), norm)
    q, s = (_quantize_rows(h) if s_static is None
            else _quantize_static(h, s_static))
    for i in range(n_w):
        acc = jnp.dot(q, w_refs[i][:, :], preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (s * scale_refs[i][0:1, :]) + bias_refs[i][0:1, :]
        if act == "gelu2":
            y = _gelu2(y)
        elif act != "none":
            raise ValueError(act)
        if use_residual:
            y = y + res_ref[:, :].astype(jnp.float32)
        out_refs[i][:, :] = y.astype(out_refs[i].dtype)


def fused_quant_dense_multi(
    x: jnp.ndarray,                       # (M, K) bf16/f32, M % block_m == 0
    ws,                                   # sequence of QuantizedWeight (K, N_i)
    *,
    norm: str = "none",
    mod: Optional[jnp.ndarray] = None,
    act: str = "none",
    residual: Optional[jnp.ndarray] = None,    # (M, N) — requires equal N_i
    block_m: int = 128,
    out_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
    s_static: Optional[float] = None,
):
    """V2 kernel: one (norm -> quantize) prologue feeding SEVERAL int8 dots.

    Design (from the v1 post-mortem, tools/bench_int8_micro.py + HLO study):
    - grid over M only; every weight block maps to (0, 0) so Mosaic keeps the
      full (K, N_i) weights VMEM-resident across programs instead of
      re-streaming them per row-block (v1's bandwidth bound);
    - the prologue runs once per row-block (v1 redid it per N-tile);
    - multiple outputs share the quantized activation — q/k/v cost one
      quantize instead of three (and XLA's per-dense s8 relayout copies,
      which its int8 dot layout forces, never happen: Mosaic owns the tiling).

    Returns a tuple of (M, N_i) arrays (single element if one weight).
    """
    M, K = x.shape
    ws = tuple(ws)
    n_w = len(ws)
    assert M % block_m == 0, (M, block_m)
    if norm == "ln" and mod is None:
        raise ValueError("norm='ln' requires mod = (gamma, beta) rows")
    if mod is None:
        mod = jnp.zeros((2, K), jnp.float32)
    use_residual = residual is not None
    if use_residual and any(w.w_q.shape[1] != ws[0].w_q.shape[1] for w in ws):
        raise ValueError("residual requires equal output widths")

    grid = (M // block_m,)
    in_specs = [
        pl.BlockSpec((block_m, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, mod]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.w_q.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(w.w_q)
    for w in ws:
        in_specs.append(pl.BlockSpec(w.scale.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(w.scale)
    for w in ws:
        in_specs.append(pl.BlockSpec(w.bias.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(w.bias)
    if use_residual:
        in_specs.append(pl.BlockSpec((block_m, residual.shape[1]),
                                     lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(residual)

    out_shape = tuple(jax.ShapeDtypeStruct((M, w.w_q.shape[1]), out_dtype)
                      for w in ws)
    out_specs = tuple(pl.BlockSpec((block_m, w.w_q.shape[1]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM) for w in ws)

    outs = pl.pallas_call(
        partial(_kernel_multi, norm=norm, act=act, n_w=n_w,
                use_residual=use_residual, s_static=s_static),
        out_shape=out_shape,
        grid_spec=pl.GridSpec(grid=grid, in_specs=in_specs, out_specs=out_specs),
        interpret=interpret,
    )(*args)
    return outs


def quant_dense_xla(
    x: jnp.ndarray,
    w: QuantizedWeight,
    *,
    norm: str = "none",
    mod: Optional[jnp.ndarray] = None,
    act: str = "none",
    residual: Optional[jnp.ndarray] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
    s_static: Optional[float] = None,
) -> jnp.ndarray:
    """Portable/fallback int8 path: same math as the kernel, expressed as XLA
    ops with an int8 x int8 -> int32 ``jnp.dot``. Bit-identical to
    ``quant_dense_reference``; runs on any backend (CPU tests, non-TPU).

    NOT the production path: the round-1 micro-benchmark that rated this
    faster than the Pallas kernels was a relay artifact — the trace-verified
    round-2 A/B at flagship scale measured the block-fused Pallas kernels
    (ops/int8_block.py) at 6.18 ms/step vs 9.23 for this XLA dense path
    (CLAUDE.md ledger). Serving uses impl='pallas'; this stays as the
    portable twin and ablation baseline.
    """
    if norm == "ln" and mod is None:
        raise ValueError("norm='ln' requires mod = (gamma, beta) rows")
    if mod is None:
        mod = jnp.zeros((2, x.shape[-1]), jnp.float32)
    h = _prologue(x.astype(jnp.float32), mod[0:1], mod[1:2], norm)
    q, s = (_quantize_rows(h) if s_static is None
            else _quantize_static(h, s_static))
    acc = jnp.dot(q, w.w_q, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s * w.scale) + w.bias
    if act == "gelu2":
        y = _gelu2(y)
    elif act != "none":
        raise ValueError(act)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(out_dtype)


def quant_dense_reference(
    x: jnp.ndarray,
    w: QuantizedWeight,
    *,
    norm: str = "none",
    mod: Optional[jnp.ndarray] = None,
    act: str = "none",
    residual: Optional[jnp.ndarray] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
    s_static: Optional[float] = None,
) -> jnp.ndarray:
    """jnp twin of the kernel — identical math, any backend (test oracle)."""
    if mod is None:
        mod = jnp.zeros((2, x.shape[-1]), jnp.float32)
    h = _prologue(x.astype(jnp.float32), mod[0:1], mod[1:2], norm)
    q, s = (_quantize_rows(h) if s_static is None
            else _quantize_static(h, s_static))
    acc = jnp.dot(q.astype(jnp.int32), w.w_q.astype(jnp.int32))
    y = acc.astype(jnp.float32) * (s * w.scale) + w.bias
    if act == "gelu2":
        y = _gelu2(y)
    elif act != "none":
        raise ValueError(act)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(out_dtype)

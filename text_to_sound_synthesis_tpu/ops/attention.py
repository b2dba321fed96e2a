"""Fused multi-head attention Pallas kernel for the int8 serving runtime.

Operates directly on the flat (B*L_pad, D) bf16 layout the quant-dense kernels
(ops/quant.py::fused_quant_dense_multi) produce — heads are sliced in-VMEM, so
XLA never materializes the (B, L, H, hd) reshapes / (B, H, L, S) transposes
that cost ~3 ms/step at flagship scale (profiled: reshape 1.4 + copy 1.0 +
slice_bitcast 0.7 per step around the XLA einsum attention).

One grid program per batch element: scores (L_pad, KV_pad) f32 per head stay
in VMEM/registers, softmax in f32, pad keys masked with -inf. Sequence lengths
here are short (265 content / 77 condition tokens), so the whole per-batch
attention fits VMEM — no KV streaming needed (flash-attention's tiling would
be pure overhead at this size).

``mha_reference`` is the jnp twin (test oracle + CPU fallback).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mha", "mha_reference"]


def _mha_kernel(q_ref, k_ref, v_ref, out_ref, *, n_head: int, kv_valid: int):
    D = q_ref.shape[-1]
    hd = D // n_head
    Lkv = k_ref.shape[0]
    scale = 1.0 / math.sqrt(hd)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, Lkv), 1)
    bias = jnp.where(col >= kv_valid, -jnp.inf, 0.0).astype(jnp.float32)

    for h in range(n_head):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[:, sl]
        kh = k_ref[:, sl]
        vh = v_ref[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
        out_ref[:, sl] = o.astype(out_ref.dtype)


def fused_mha(
    q: jnp.ndarray,        # (B * Lq_pad, D) bf16 — row-major [batch, pos]
    k: jnp.ndarray,        # (B * Lkv_pad, D)
    v: jnp.ndarray,        # (B * Lkv_pad, D)
    *,
    batch: int,
    n_head: int,
    kv_valid: int,         # keys >= kv_valid are masked (padding)
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B * Lq_pad, D) attention output in the same flat layout.

    Query padding rows produce garbage rows (they attend normally) — callers
    drop them; they never contaminate valid rows because only KEYS are masked.
    """
    M, D = q.shape
    Mkv = k.shape[0]
    assert M % batch == 0 and Mkv % batch == 0, (M, Mkv, batch)
    Lq = M // batch
    Lkv = Mkv // batch

    return pl.pallas_call(
        partial(_mha_kernel, n_head=n_head, kv_valid=kv_valid),
        out_shape=jax.ShapeDtypeStruct((M, D), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(batch,),
            in_specs=[
                pl.BlockSpec((Lq, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Lkv, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Lkv, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Lq, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q, k, v)


def mha_reference(q, k, v, *, batch, n_head, kv_valid):
    """jnp twin of the kernel (any backend)."""
    M, D = q.shape
    hd = D // n_head
    Lq = M // batch
    Lkv = k.shape[0] // batch
    qh = q.reshape(batch, Lq, n_head, hd)
    kh = k.reshape(batch, Lkv, n_head, hd)
    vh = v.reshape(batch, Lkv, n_head, hd)
    # accumulate scores in f32 (like the kernel) — a bf16 einsum would make
    # this oracle LESS precise than the kernel it validates
    s = jnp.einsum("blhd,bshd->bhls", qh, kh,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    mask = (jnp.arange(Lkv) >= kv_valid)[None, None, None, :]
    s = jnp.where(mask, -jnp.inf, s)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhls,bshd->blhd", p, vh)
    return o.reshape(M, D)

"""Fused GroupNorm -> swish -> 3x3 conv Pallas kernel (NHWC, stride 1, pad 1).

STATUS: MEASURED NEGATIVE — kept in-tree, default OFF (see below).

Motivation: in the SpecVQGAN encoder/decoder (models/vqgan/modules.py;
reference ``Codebook/specvqgan/modules/diffusionmodules/model.py:92-151``)
every ResnetBlock runs ``conv3x3(swish(GroupNorm(x)))`` twice, and the r2/r3
train-step traces attribute large ``convert_reduce_fusion`` time to the
GroupNorm statistic passes.  The hypothesis was that XLA lowers the pattern
as stats pass + apply pass + conv (3 reads + 2 writes of activations up to
139 MB), because conv custom calls "never fuse" with elementwise neighbours.

The device-trace A/B (tools/bench_gn_conv.py, v5e-1, batch 8, bf16, all five
flagship decoder stages) REFUTED the premise for the forward direction:

  * XLA emits ``convolution_convert_fusion`` — the normalize+swish chain IS
    fused into the conv's input read by the TPU conv emitter.  At
    (8,20,212,256) the fused conv runs 215.7 us vs a 203 us pure-MXU floor:
    ~94% of bf16 nameplate, i.e. speed-of-light.  Only the tiny stats reduce
    (7.2 us) stands apart.
  * This kernel (one wide MXU dot per 3x3 tap over dx-pre-shifted VMEM
    copies) reaches only ~68-73% of nameplate: the scatter/normalize/emit
    VPU phases serialize against the MXU (Mosaic schedules program order and
    will not overlap VPU chains with MXU — docs/ROOFLINE.md finding 2), and
    the ashift staging moves each tile through VMEM several extra times.
    Measured 0.76-0.91x vs XLA across the decoder stages.

Conclusion: on this toolchain XLA's conv emitter + operand fusion is already
near-optimal for norm-act-conv stacks; a Pallas rewrite pays more in VPU
serialization than it can save in HBM traffic.  The kernel stays as the
measured evidence and as a correctness-tested example of halo-via-BlockSpec
convolution (three clamped index maps double as the conv zero ring).

Enable explicitly with ``T2S_FUSED_GN=1`` (TPU) or ``=interpret`` (CPU
tests).  ``gn_swish_conv`` carries a custom VJP (the XLA composition's VJP),
so it is safe under ``jax.grad`` wherever it is enabled.
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "gn_swish_conv",
    "gn_swish_conv_reference",
    "fused_gn_eligible",
    "gn_affine",
]

_EPS = 1e-6
# VMEM working-set budget for picking the row-block size (bytes). ~16 MB/core
# total; leave room for Mosaic's double buffering of the in/out streams.
_VMEM_BUDGET = 11 * 1024 * 1024


def gn_affine(x, gamma, beta, groups: int, eps: float = _EPS):
    """Per-(batch, channel) affine for GroupNorm: returns f32 (B, C) scale/shift
    with ``norm(x) = x * scale + shift``.

    Stats use the fast-variance form E[x^2] - E[x]^2 in f32, matching
    ``flax.linen.GroupNorm(use_fast_variance=True)`` (the unfused path in
    models/vqgan/modules.py).
    """
    B, H, W, C = x.shape
    gsz = C // groups
    xf = x.astype(jnp.float32).reshape(B, H * W, groups, gsz)
    mean = jnp.mean(xf, axis=(1, 3))                      # (B, G)
    var = jnp.mean(jnp.square(xf), axis=(1, 3)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)                       # (B, G)
    rstd_c = jnp.repeat(rstd, gsz, axis=1)                # (B, C)
    mean_c = jnp.repeat(mean, gsz, axis=1)
    gamma = gamma.astype(jnp.float32)[None, :]
    beta = beta.astype(jnp.float32)[None, :]
    scale = rstd_c * gamma
    shift = beta - mean_c * scale
    return scale, shift


def _pick_bh(H, W, C, Co, itemsize):
    """Largest divisor of H (<=32) whose kernel working set fits the budget."""
    Wp = _round_up(W + 2, 16)
    best = 1
    for bh in range(1, min(H, 32) + 1):
        if H % bh:
            continue
        center = 2 * bh * W * C * itemsize          # double-buffered in-stream
        halo = 4 * W * C * itemsize
        out = 2 * bh * W * Co * itemsize
        ashift = 3 * (bh + 2) * Wp * C * itemsize
        wts = 9 * C * Co * itemsize
        row_tmp = 2 * W * C * (4 + itemsize)        # per-row f32 norm temps
        acc = 2 * bh * Wp * Co * 4                  # conv accumulator (val+ref)
        if center + halo + out + ashift + wts + row_tmp + acc <= _VMEM_BUDGET:
            best = bh
    return best


def _kernel(top_ref, mid_ref, bot_ref, scale_ref, shift_ref, w_ref, b_ref,
            out_ref, ashift_ref, acc_ref, *, bh, W, Wp, Co, out_dtype):
    """ashift_ref: (3, (bh+2)*Wp, C) — three dx-shifted, row-flattened copies
    of the normalized+activated padded tile.  Row r of the padded tile lives
    at flattened rows [r*Wp, r*Wp+Wp); copy dx holds ``a_pad[r, w+dx]``.  The
    3x3 conv then needs NO shifted operands: for each kernel tap (dy, dx) the
    whole-tile operand is the aligned slice ashift[dx][dy*Wp : (dy+bh)*Wp],
    giving 9 large MXU dots per program instead of 9 per row."""
    i = pl.program_id(1)
    n = pl.num_programs(1)
    C = ashift_ref.shape[-1]

    sc = scale_ref[0, 0, :][None, :]
    sh = shift_ref[0, 0, :][None, :]

    for dx in range(3):
        ashift_ref[dx, :, :] = jnp.zeros(((bh + 2) * Wp, C), ashift_ref.dtype)

    def scatter_row(v_raw, r):
        """Normalize+swish one raw row (1, W, C) and store its three shifted
        images at padded-tile row r (a dynamic index)."""
        v = v_raw[0].astype(jnp.float32)
        v = v * sc + sh
        v = v * jax.nn.sigmoid(v)
        v = v.astype(ashift_ref.dtype)
        base = pl.multiple_of(r * Wp, 16)
        # a_pad[r, 1:W+1] = v; copy dx stores a_pad[r, w+dx] at w.  All stores
        # land at the 16-aligned row base; the dx=0 shift happens in the value
        # (sublane-axis concat) because Mosaic requires aligned store offsets.
        v0 = jnp.concatenate([jnp.zeros((1, v.shape[-1]), v.dtype), v], axis=0)
        ashift_ref[0, pl.ds(base, W + 1), :] = v0
        ashift_ref[1, pl.ds(base, W), :] = v
        ashift_ref[2, pl.ds(base, W - 1), :] = v[1:W, :]

    # Top halo (padded-tile row 0) is the conv zero ring for the first tile.
    @pl.when(i > 0)
    def _():
        scatter_row(top_ref[0, 0:1], 0)

    def mid_row(r, carry):
        scatter_row(mid_ref[0, pl.ds(r, 1)], r + 1)
        return carry

    jax.lax.fori_loop(0, bh, mid_row, 0)

    @pl.when(i < n - 1)
    def _():
        scatter_row(bot_ref[0, 0:1], bh + 1)

    acc = jnp.zeros((bh * Wp, Co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc += jnp.dot(ashift_ref[dx, pl.ds(dy * Wp, bh * Wp), :],
                           w_ref[dy, dx], preferred_element_type=jnp.float32)
    acc_ref[:, :] = acc

    bias = b_ref[0, :].astype(jnp.float32)[None, :]

    def emit_row(r, carry):
        y = acc_ref[pl.ds(r * Wp, W), :] + bias
        out_ref[0, pl.ds(r, 1), :, :] = y.astype(out_dtype)[None]
        return carry

    jax.lax.fori_loop(0, bh, emit_row, 0)


def _round_up(v, m):
    return -(-v // m) * m


def _conv_call(x, scale, shift, kernel, bias, *, interpret=False):
    B, H, W, C = x.shape
    Co = kernel.shape[-1]
    bh = _pick_bh(H, W, C, Co, jnp.dtype(x.dtype).itemsize)
    n_h = H // bh
    Wp = _round_up(W + 2, 16)
    kern = kernel.astype(x.dtype)
    bias2 = bias.astype(jnp.float32).reshape(1, Co)

    grid = (B, n_h)
    in_specs = [
        pl.BlockSpec((1, 1, W, C),
                     lambda b, i: (b, jnp.maximum(i * bh - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bh, W, C), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, W, C),
                     lambda b, i: (b, jnp.minimum(i * bh + bh, H - 1), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, C, Co), lambda b, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Co), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, bh, W, Co), lambda b, i: (b, i, 0, 0),
                            memory_space=pltpu.VMEM)
    flops = 2 * B * H * W * C * Co * 9
    return pl.pallas_call(
        partial(_kernel, bh=bh, W=W, Wp=Wp, Co=Co, out_dtype=x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, (bh + 2) * Wp, C), x.dtype),
            pltpu.VMEM((bh * Wp, Co), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(x.size * x.dtype.itemsize * (bh + 2) // bh
                               + B * H * W * Co * x.dtype.itemsize),
            transcendentals=int(x.size),
        ),
        interpret=interpret,
    )(x, x, x, scale.reshape(B, 1, C), shift.reshape(B, 1, C), kern, bias2)


def gn_swish_conv_reference(x, gamma, beta, kernel, bias, *, groups: int,
                            eps: float = _EPS):
    """XLA composition with the kernel's exact numerics (f32 norm+swish, f32
    conv accumulate, single cast to x.dtype at the end)."""
    scale, shift = gn_affine(x, gamma, beta, groups, eps)
    a = x.astype(jnp.float32) * scale[:, None, None, :] + shift[:, None, None, :]
    a = a * jax.nn.sigmoid(a)
    # Round operands to x.dtype then contract in f32 — bit-identical to the
    # kernel's MXU bf16 x bf16 -> f32 accumulate (and a no-op for f32), while
    # keeping the conv single-dtype so its transpose rule is well-typed.
    a = a.astype(x.dtype).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        a, kernel.astype(x.dtype).astype(jnp.float32), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + bias.astype(jnp.float32)[None, None, None, :]).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gn_swish_conv(groups, interpret, x, gamma, beta, kernel, bias):
    scale, shift = gn_affine(x, gamma, beta, groups)
    return _conv_call(x, scale, shift, kernel, bias, interpret=interpret)


def _fwd(groups, interpret, x, gamma, beta, kernel, bias):
    y = _gn_swish_conv(groups, interpret, x, gamma, beta, kernel, bias)
    return y, (x, gamma, beta, kernel, bias)


def _bwd(groups, interpret, res, g):
    x, gamma, beta, kernel, bias = res
    _, vjp = jax.vjp(
        lambda x_, ga_, be_, k_, b_: gn_swish_conv_reference(
            x_, ga_, be_, k_, b_, groups=groups),
        x, gamma, beta, kernel, bias)
    return vjp(g)


_gn_swish_conv.defvjp(_fwd, _bwd)


def fused_gn_eligible(x_shape, out_ch: int) -> bool:
    """Whether the fused kernel should be used for this site.

    Default OFF — the kernel is a measured negative vs XLA's own
    convolution_convert_fusion (module docstring).  Opt in with
    ``T2S_FUSED_GN=1`` on TPU (lane-aligned channels only) or
    ``T2S_FUSED_GN=interpret`` on CPU (tests).
    """
    mode = os.environ.get("T2S_FUSED_GN", "0")
    if mode == "0":
        return False
    _, H, W, C = x_shape
    if H < 1 or W < 1:
        return False
    if mode == "interpret":
        return True
    if jax.default_backend() != "tpu":
        return False
    return C % 128 == 0 and out_ch % 128 == 0


def gn_swish_conv(x, gamma, beta, kernel, bias, *, groups: int):
    """y = conv3x3(swish(GroupNorm(x; gamma, beta)), kernel) + bias.

    Differentiable (custom VJP).  Caller gates with ``fused_gn_eligible``.
    """
    interpret = os.environ.get("T2S_FUSED_GN", "0") == "interpret"
    return _gn_swish_conv(groups, interpret, x, gamma, beta, kernel, bias)

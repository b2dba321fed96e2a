"""Fused reverse-diffusion sampler step — Pallas TPU kernel.

Everything in the sampler step EXCEPT the transformer forward, fused into one
VMEM-resident kernel over (rows = B*L, classes K):

  logits -> log_softmax -> [-70] MASK column -> top-r truncation (bisection
  threshold, no sort) -> mask-aware q_posterior (from token INDICES, never
  materializing one-hots) -> Gumbel-argmax sample -> next token indices.

The jnp reference implementation (``p_sample_from_indices``) defines the exact
semantics and serves as the CPU fallback + test oracle. Math mirrors
ops/diffusion.py (itself parity-tested against the reference's
``diffusion_transformer.py:269-368``); the truncation uses a probability-
threshold bisection equivalent to the sort-based ``top0.85r`` rule up to
floating-point ties at the nucleus boundary.

Why it pays: the XLA path lowers this chain to many small HBM-bound kernels
plus a 257-wide sort (~2-3 ms per step at B=8); here it is one pass over VMEM
tiles with the PRNG on-core.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .diffusion import LOG_EPS, MIN_LOGP, DiffusionSchedule

__all__ = ["StepCoeffs", "step_coeffs", "p_sample_from_indices", "fused_p_sample",
           "fused_head_sample", "head_sample_reference"]

_BISECT_ITERS = 24


class StepCoeffs(NamedTuple):
    """Scalar schedule coefficients for one sampler step (posterior at t_post)."""

    log_at: jnp.ndarray
    log_bt: jnp.ndarray
    log_ct: jnp.ndarray
    log_cum_at: jnp.ndarray
    log_cum_bt: jnp.ndarray
    log_cum_ct: jnp.ndarray
    log_cum_at_prev: jnp.ndarray       # at t_post - 1 (identity when t_post == 0)
    log_cum_bt_prev: jnp.ndarray
    log_cum_ct_prev: jnp.ndarray
    log_1_min_cum_ct_prev: jnp.ndarray

    def as_array(self) -> jnp.ndarray:
        return jnp.stack(list(self))


def step_coeffs(sched: DiffusionSchedule, t_post: jnp.ndarray) -> StepCoeffs:
    """Gather the 10 scalars for posterior time ``t_post`` (scalar int)."""
    T = sched.num_timesteps
    tp = t_post
    tprev = (tp - 1 + (T + 1)) % (T + 1)
    return StepCoeffs(
        log_at=sched.log_at[tp],
        log_bt=sched.log_bt[tp],
        log_ct=sched.log_ct[tp],
        log_cum_at=sched.log_cumprod_at[tp],
        log_cum_bt=sched.log_cumprod_bt[tp],
        log_cum_ct=sched.log_cumprod_ct[tp],
        log_cum_at_prev=sched.log_cumprod_at[tprev],
        log_cum_bt_prev=sched.log_cumprod_bt[tprev],
        log_cum_ct_prev=sched.log_cumprod_ct[tprev],
        log_1_min_cum_ct_prev=sched.log_1_min_cumprod_ct[tprev],
    )


def _log_add_exp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    return m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))


def _posterior_rows(lp, xt, c: StepCoeffs, K: int, col):
    """Shared posterior math over a (rows, K) tile given token indices xt
    (rows, 1) and class-column ids ``col`` (rows, K)."""
    is_tok = col < K - 1
    at_state = col == xt                       # evaluated x_t position
    state_is_mask = xt == K - 1                # (rows, 1) broadcast

    # log q(x_t | x0 = k): token k -> log_add_exp(delta + cum_at, cum_bt);
    # mask column -> LOG_EPS; mask state -> cum_ct columns (ops/diffusion.py)
    onehot_log = jnp.where(at_state, 0.0, LOG_EPS)
    log_qt_tok = _log_add_exp(onehot_log + c.log_cum_at, c.log_cum_bt)
    log_qt = jnp.where(is_tok, log_qt_tok, LOG_EPS)
    log_qt = jnp.where(state_is_mask,
                       jnp.where(is_tok, c.log_cum_ct, 0.0), log_qt)

    # log q(x_t | x_{t-1} = k) one step
    log_qt1_tok = _log_add_exp(onehot_log + c.log_at, c.log_bt)
    log_qt1 = jnp.where(is_tok, log_qt1_tok, LOG_EPS)
    log_qt1 = jnp.where(state_is_mask,
                        jnp.where(is_tok, c.log_ct, 0.0), log_qt1)

    q = lp - log_qt
    qm = jnp.max(q, axis=-1, keepdims=True)
    qlse = qm + jnp.log(jnp.sum(jnp.exp(q - qm), axis=-1, keepdims=True))
    qn = q - qlse
    prev_tok = _log_add_exp(qn + c.log_cum_at_prev, c.log_cum_bt_prev)
    prev_msk = _log_add_exp(qn + c.log_1_min_cum_ct_prev, c.log_cum_ct_prev)
    out = jnp.where(is_tok, prev_tok, prev_msk) + log_qt1 + qlse
    return jnp.clip(out, MIN_LOGP, 0.0)


def _truncate_rows(lp, r: float, iters: int = _BISECT_ITERS):
    """Bisection top-r nucleus over the class axis (keep p > tau, + argmax)."""
    p = jnp.exp(lp)
    lo = jnp.zeros(lp.shape[:-1] + (1,), lp.dtype)
    hi = jnp.ones_like(lo)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        above = jnp.sum(jnp.where(p > mid, p, 0.0), axis=-1, keepdims=True)
        take = above < r
        hi = jnp.where(take, mid, hi)
        lo = jnp.where(take, lo, mid)
    amax = jnp.max(lp, axis=-1, keepdims=True)
    keep = (p > hi) | (lp == amax)
    return jnp.where(keep, lp, MIN_LOGP)


def p_sample_from_indices(
    logits: jnp.ndarray,        # (B, L, K-1) raw denoiser logits
    xt: jnp.ndarray,            # (B, L) current token indices
    coeffs: StepCoeffs,
    key: jax.Array,
    *,
    truncation_r: float = 0.0,  # 0 disables
    return_log_probs: bool = False,
) -> jnp.ndarray:
    """jnp reference of the fused step; returns next token indices (B, L)."""
    K = logits.shape[-1] + 1
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp = jnp.concatenate(
        [lp, jnp.full(lp.shape[:-1] + (1,), MIN_LOGP, lp.dtype)], axis=-1
    )
    lp = jnp.clip(lp, MIN_LOGP, 0.0)
    if truncation_r > 0.0:
        lp = _truncate_rows(lp, truncation_r)
    col = jnp.arange(K)[None, None, :]
    out = _posterior_rows(lp, xt[..., None], coeffs, K, col)
    g = jax.random.gumbel(key, out.shape, out.dtype)
    tokens = jnp.argmax(out + g, axis=-1)
    if return_log_probs:
        return tokens, out
    return tokens


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _sampler_body(logits, xt, c: StepCoeffs, *, K: int, Kpad: int, r: float):
    """Shared in-kernel math: raw logits tile (rows, Kpad) f32 + current token
    indices (rows, 1) -> (next tokens (rows, 1) int32, posterior (rows, Kpad)).
    The caller must have seeded the per-core PRNG."""
    rows = logits.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, Kpad), 1)
    valid = col < K - 1  # real (non-mask, non-pad) logit columns

    x = jnp.where(valid, logits, -jnp.inf)
    m = jnp.max(x, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.where(valid, jnp.exp(x - m), 0.0), axis=-1,
                              keepdims=True))
    lp = jnp.where(valid, x - lse, MIN_LOGP)          # MASK col + pads -> -70
    lp = jnp.clip(lp, MIN_LOGP, 0.0)

    if r > 0.0:
        p = jnp.where(valid, jnp.exp(lp), 0.0)
        lo = jnp.zeros((rows, 1), jnp.float32)
        hi = jnp.ones((rows, 1), jnp.float32)

        def bis(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            above = jnp.sum(jnp.where(p > mid, p, 0.0), axis=-1, keepdims=True)
            take = above < r
            return jnp.where(take, lo, mid), jnp.where(take, mid, hi)

        lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, bis, (lo, hi))
        amax = jnp.max(jnp.where(valid, lp, -jnp.inf), axis=-1, keepdims=True)
        keep = (p > hi) | ((lp == amax) & valid)
        lp = jnp.where(keep, lp, MIN_LOGP)

    in_k = col < K
    # pad columns must vanish from the posterior's logsumexp: -inf, not -70
    lp_post = jnp.where(in_k, lp, -jnp.inf)
    post = _posterior_rows(lp_post, xt, c, K, col)
    post = jnp.where(in_k, post, -jnp.inf)

    bits = pltpu.bitcast(pltpu.prng_random_bits((rows, Kpad)), jnp.uint32)
    # Mosaic lacks uint32->f32 casts; >>8 fits in non-negative int32 first
    mant = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
    u = mant * (1.0 / (1 << 24))
    g = -jnp.log(-jnp.log(u + 1e-30) + 1e-30)
    scores = jnp.where(in_k, post + g, -jnp.inf)
    tokens = jnp.argmax(scores, axis=-1, keepdims=True).astype(jnp.int32)
    return tokens, post


def _kernel(seed_ref, coef_ref, logits_ref, xt_ref, out_ref, probs_ref, *, K: int,
            Kpad: int, r: float):
    # seed and program id mixed as SEPARATE words: `seed + program_id` would
    # collide along (step, block) diagonals when callers pass base + step_idx
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    c = StepCoeffs(*[coef_ref[i] for i in range(10)])
    tokens, post = _sampler_body(logits_ref[:, :].astype(jnp.float32),
                                 xt_ref[:, :], c, K=K, Kpad=Kpad, r=r)
    probs_ref[:, :] = post
    out_ref[:, :] = tokens


def fused_p_sample(
    logits: jnp.ndarray,       # (B, L, K-1)
    xt: jnp.ndarray,           # (B, L)
    coeffs: StepCoeffs,
    seed: jnp.ndarray,         # scalar int32 (vary per step!)
    *,
    truncation_r: float = 0.0,
    row_block: int = 256,
    interpret: bool = False,
    return_log_probs: bool = False,
) -> jnp.ndarray:
    """Pallas-fused sampler step; returns next token indices (B, L)
    (+ the posterior log-probs (B, L, K) when ``return_log_probs``)."""
    B, L, Km1 = logits.shape
    K = Km1 + 1
    Kpad = -(-K // 128) * 128
    R = B * L
    Rpad = -(-R // row_block) * row_block

    flat = logits.reshape(R, Km1)
    flat = jnp.pad(flat, ((0, Rpad - R), (0, Kpad - Km1)), constant_values=-1e30)
    xt_flat = jnp.pad(xt.reshape(R, 1), ((0, Rpad - R), (0, 0))).astype(jnp.int32)

    out, probs = pl.pallas_call(
        partial(_kernel, K=K, Kpad=Kpad, r=truncation_r),
        out_shape=(
            jax.ShapeDtypeStruct((Rpad, 1), jnp.int32),
            jax.ShapeDtypeStruct((Rpad, Kpad), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # seed, coeffs
            grid=(Rpad // row_block,),
            in_specs=[
                pl.BlockSpec((row_block, Kpad), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_block, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((row_block, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_block, Kpad), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), coeffs.as_array().astype(jnp.float32),
      flat, xt_flat)
    tokens = out[:R, 0].reshape(B, L)
    if return_log_probs:
        return tokens, probs[:R, :K].reshape(B, L, K)
    return tokens


# ---------------------------------------------------------------------------
# fused final-LN + head matmul + sampler step (int8 serving path)
# ---------------------------------------------------------------------------

def _head_kernel(seed_ref, coef_ref, x_ref, xt_ref, ln_ref, hw_ref, hb_ref,
                 out_ref, *maybe_probs, K: int, Kpad: int, r: float):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))  # see _kernel note
    c = StepCoeffs(*[coef_ref[i] for i in range(10)])

    xf = x_ref[:, :].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    xn = xn * ln_ref[0:1, :].astype(jnp.float32) + ln_ref[1:2, :].astype(jnp.float32)
    logits = jnp.dot(xn.astype(jnp.bfloat16), hw_ref[:, :],
                     preferred_element_type=jnp.float32) + hb_ref[0:1, :]

    tokens, post = _sampler_body(logits, xt_ref[:, :], c, K=K, Kpad=Kpad, r=r)
    out_ref[:, :] = tokens
    if maybe_probs:
        maybe_probs[0][:, :] = post


def fused_head_sample(
    x: jnp.ndarray,            # (M, D) bf16 — final backbone activations
    xt: jnp.ndarray,           # (M, 1) int32 current tokens (pad rows arbitrary)
    norm_out: jnp.ndarray,     # (2, D) f32 — final LayerNorm gamma; beta
    head_w: jnp.ndarray,       # (D, K-1) bf16
    head_b: jnp.ndarray,       # (K-1,) f32
    coeffs: StepCoeffs,
    seed: jnp.ndarray,         # scalar int32 (vary per step!)
    *,
    truncation_r: float = 0.0,
    row_block: int | None = None,
    interpret: bool = False,
    return_log_probs: bool = False,
) -> jnp.ndarray:
    """One kernel for the whole tail of a sampler step: final LayerNorm ->
    logits head -> log-softmax/truncation/posterior/Gumbel-argmax.

    Replaces (XLA LN + head matmul + ``fused_p_sample``) in the int8 serving
    path — the (M, K) logits never visit HBM. Semantics == LN + head +
    ``p_sample_from_indices`` (oracle ``head_sample_reference``); rows are
    whatever padded layout the caller uses (pad rows produce garbage tokens the
    caller drops).
    """
    M, D = x.shape
    Km1 = head_w.shape[1]
    K = Km1 + 1
    Kpad = -(-K // 128) * 128
    if row_block is None:
        row_block = max(rb for rb in (544, 512, 272, 256, 136, 128, 64, 32, 16, 8)
                        if M % rb == 0)
    assert M % row_block == 0, (M, row_block)

    hw = jnp.pad(head_w.astype(jnp.bfloat16), ((0, 0), (0, Kpad - Km1)))
    hb = jnp.pad(head_b.astype(jnp.float32), (0, Kpad - Km1)).reshape(1, Kpad)

    rowspec = lambda w: pl.BlockSpec((row_block, w), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((M, 1), jnp.int32)]
    out_specs = [rowspec(1)]
    if return_log_probs:
        out_shape.append(jax.ShapeDtypeStruct((M, Kpad), jnp.float32))
        out_specs.append(rowspec(Kpad))

    outs = pl.pallas_call(
        partial(_head_kernel, K=K, Kpad=Kpad, r=truncation_r),
        out_shape=tuple(out_shape),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # seed, coeffs
            grid=(M // row_block,),
            in_specs=[
                rowspec(D),
                rowspec(1),
                pl.BlockSpec((2, D), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, Kpad), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Kpad), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(out_specs),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), coeffs.as_array().astype(jnp.float32),
      x.astype(jnp.bfloat16), xt.astype(jnp.int32), norm_out.astype(jnp.float32),
      hw, hb)
    if return_log_probs:
        return outs[0][:, 0], outs[1][:, :K]
    return outs[0][:, 0]


def head_sample_reference(x, xt, norm_out, head_w, head_b, coeffs, key, *,
                          truncation_r: float = 0.0):
    """jnp oracle for ``fused_head_sample`` (same math, jax.random Gumbel):
    returns (tokens (M,), posterior log-probs (M, K))."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    xn = xn * norm_out[0] + norm_out[1]
    logits = jnp.dot(xn.astype(jnp.bfloat16), head_w.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + head_b
    toks, post = p_sample_from_indices(
        logits[None], xt.reshape(1, -1), coeffs, key,
        truncation_r=truncation_r, return_log_probs=True)
    return toks[0], post[0]

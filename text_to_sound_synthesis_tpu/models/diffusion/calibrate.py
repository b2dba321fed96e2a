"""Static activation-scale calibration for the int8 serving engine.

Per-token dynamic W8A8 quantization pays an abs-max VPU reduction at every
quantize site — six per layer, the widest over the (M, 4D) GELU2 output —
and docs/ROOFLINE.md shows the served step is VPU-pass-bound, not
MXU-rate-bound. Static (calibrated) per-tensor scales delete those passes:
the quantize becomes a single multiply/round/clip with a Python-float scale
baked into the kernel trace (ops/quant._quantize_static).

Calibration protocol: run the SAME sampler trajectory the dynamic engine
serves (all-MASK start, the full timestep plan, the production top-r
truncation — reference contract ``Diffsound/sound_synthesis/modeling/
transformers/diffusion_transformer.py:587-659``) on representative
conditioning, recording max |h| at each site across every timestep, row and
batch element. Scales are amax * margin / 127. This is standard post-training
static quantization (the TensorRT-style calibration pass the reference's
torch stack would get from an int8 deployment toolchain); it has no reference
counterpart — serving-tier bonus, like the rest of the int8 engine.

Accuracy contract: values beyond the calibrated amax saturate, so static
quantization is only safe on conditioning distributions resembling the
calibration set; the drift gate (tools/eval_int8_drift.py --static) is the
acceptance test. The dynamic path stays the default.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops import diffusion as dd
from ...ops import fused_sampler as fs
from ...ops.quant import _gelu2, _prologue, _quantize_rows
from .int8_runtime import Int8Denoiser, precompute_cond_kvs

__all__ = ["calibrate_act_scales", "N_SITES"]

# per-layer quantize sites, in order:
#   attn_in, attn_out, cross_in, cross_out, mlp_in, mlp_mid
N_SITES = 6


def _dense(q, s, w):
    acc = jnp.dot(q, w.w_q, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s * w.scale) + w.bias


def _attend(q, k, v, n_head: int):
    """bf16 MHA, f32 softmax — mirrors int8_runtime._attend (no padding)."""
    import math

    B, L, D = q.shape
    hd = D // n_head

    def heads(a):
        return a.reshape(a.shape[0], a.shape[1], n_head, hd)

    att = jnp.einsum("blhd,bshd->bhls", heads(q), heads(k)) / math.sqrt(hd)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhls,bshd->blhd", att, heads(v)).reshape(B, L, D)


def _backbone_amax(qp: Int8Denoiser, tokens, t, stacked, ck_st, cv_st):
    """Dynamic-int8 backbone forward that ALSO returns per-site max |h|.

    Math mirrors the served engine's xla impl (int8_runtime.py:333-353): the
    calibration trajectory is the dynamic engine's own trajectory, so the
    recorded maxima are exactly the activations the static engine will see.

    ``stacked`` is the Int8Layer pytree with a leading (n_layer,) axis and
    the layer loop is a ``lax.scan`` — unlike the served Pallas path (which
    must keep weights unstacked as dense kernel operands), calibration is
    jnp-only, and the rolled loop keeps the HLO ~n_layer× smaller (the
    unrolled flagship program exceeded the remote-compile relay's request
    size limit). Returns (logits (B, L, K-1), amax (n_layer, N_SITES) f32).
    """
    B, L = tokens.shape
    D = qp.tok_emb.shape[-1]
    H = qp.n_head

    x = (qp.tok_emb[jnp.maximum(tokens, 0)] + qp.pos_emb[None]).reshape(B * L, D)
    x = x.astype(jnp.float32)

    def flat_bf16(y):
        return y.astype(jnp.bfloat16)

    def layer_fn(x, inp):
        lyr, ck, cv = inp
        mod1 = lyr.ada1[t].reshape(2, D)
        mod2 = lyr.ada2[t].reshape(2, D)
        site = []

        h = _prologue(x, mod1[0:1], mod1[1:2], "adaln")
        site.append(jnp.max(jnp.abs(h)))
        q_, s = _quantize_rows(h)
        qh = flat_bf16(_dense(q_, s, lyr.q)).reshape(B, L, D)
        kh = flat_bf16(_dense(q_, s, lyr.k)).reshape(B, L, D)
        vh = flat_bf16(_dense(q_, s, lyr.v)).reshape(B, L, D)
        y = _attend(qh, kh, vh, H).reshape(B * L, D)
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
        site.append(jnp.max(jnp.abs(y)))
        qy, sy = _quantize_rows(y)
        # bf16 round-trips at block boundaries mirror the served engines
        # (both the xla impl and the Pallas kernels carry x as bf16)
        x = (_dense(qy, sy, lyr.proj) + x).astype(jnp.bfloat16).astype(jnp.float32)

        h2 = _prologue(x, mod2[0:1], mod2[1:2], "adaln")
        site.append(jnp.max(jnp.abs(h2)))
        q2_, s2 = _quantize_rows(h2)
        q2 = flat_bf16(_dense(q2_, s2, lyr.crossq)).reshape(B, L, D)
        y2 = _attend(q2, ck, cv, H)
        y2 = y2.reshape(B * L, D).astype(jnp.bfloat16).astype(jnp.float32)
        site.append(jnp.max(jnp.abs(y2)))
        qy2, sy2 = _quantize_rows(y2)
        x = (_dense(qy2, sy2, lyr.crossproj) + x).astype(jnp.bfloat16).astype(jnp.float32)

        h3 = _prologue(x, lyr.ln2_mod[0:1], lyr.ln2_mod[1:2], "ln")
        site.append(jnp.max(jnp.abs(h3)))
        q3, s3 = _quantize_rows(h3)
        u = _gelu2(_dense(q3, s3, lyr.fc1))
        site.append(jnp.max(jnp.abs(u)))
        qu, su = _quantize_rows(u)
        x = (_dense(qu, su, lyr.fc2) + x).astype(jnp.bfloat16).astype(jnp.float32)

        return x, jnp.stack(site)

    x, amax = jax.lax.scan(layer_fn, x, (stacked, ck_st, cv_st))

    xf = x
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    xn = xn * qp.norm_out[0] + qp.norm_out[1]
    logits = xn.astype(jnp.bfloat16) @ qp.head_w + qp.head_b.astype(jnp.bfloat16)
    return logits.reshape(B, L, -1), amax


def calibrate_act_scales(
    qp: Int8Denoiser,
    sched: dd.DiffusionSchedule,
    key: jax.Array,
    cond_emb: jnp.ndarray,              # (B, S, Dc) calibration conditioning
    *,
    truncation_r: float = 0.0,
    skip_step: int = 0,
    margin: float = 1.0,
) -> Tuple[Tuple[float, ...], ...]:
    """Run the dynamic sampler on ``cond_emb`` recording per-site amax; return
    per-layer 6-tuples of Python-float static scales (amax * margin / 127),
    ready for ``Int8Denoiser.replace(act_scales=...)``.

    One jitted scan over the full timestep plan; the running max is carried
    through the scan, so calibration costs one dynamic-engine generation on
    the calibration batch.
    """
    from .process import _timestep_plan

    K = qp.tok_emb.shape[0]
    T = qp.num_timesteps
    L = qp.seq_len
    B = cond_emb.shape[0]

    ts, t_post = _timestep_plan(T, T, skip_step)
    kvs = precompute_cond_kvs(qp, cond_emb)
    # the amax backbone attends in (B, S, D) layout; stack across layers for
    # the rolled lax.scan (see _backbone_amax)
    ck_st = jnp.stack([k.reshape(k.shape[0], k.shape[1], -1) for k, _ in kvs])
    cv_st = jnp.stack([v.reshape(v.shape[0], v.shape[1], -1) for _, v in kvs])
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qp.layers)

    n_layer = len(qp.layers)

    # weights enter as jit ARGUMENTS (closure-captured arrays are embedded
    # as constants and blow past the remote-compile relay's request limit)
    @jax.jit
    def run(qp, stacked, ck_st, cv_st, sched, key):
        tokens = jnp.full((B, L), K - 1, jnp.int32)
        amax0 = jnp.zeros((n_layer, N_SITES), jnp.float32)

        def step(carry, tt):
            tokens, key, amax = carry
            t_scalar, t_post_scalar = tt
            logits, site_amax = _backbone_amax(qp, tokens, t_scalar, stacked,
                                               ck_st, cv_st)
            amax = jnp.maximum(amax, site_amax)
            coeffs = fs.step_coeffs(sched, t_post_scalar)
            key, k = jax.random.split(key)
            tokens = fs.p_sample_from_indices(logits, tokens, coeffs, k,
                                              truncation_r=truncation_r)
            return (tokens, key, amax), ()

        (tokens, _, amax), _ = jax.lax.scan(step, (tokens, key, amax0),
                                            (ts, t_post))
        return amax

    amax = jax.device_get(run(qp, stacked, ck_st, cv_st, sched, key))
    scales = jnp.maximum(jnp.asarray(amax), 1e-6) * (margin / 127.0)
    scales = jax.device_get(scales)
    return tuple(tuple(float(s) for s in row) for row in scales)

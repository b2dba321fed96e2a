"""Block-level int8 kernels (ops/int8_block.py) + fused MHA (ops/attention.py)
vs their jnp oracles — interpret mode, CPU suite.

The real-TPU counterparts of these checks ran at flagship shape during
development (maxerr = 1 bf16 ulp); here we pin the math at small shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.ops import int8_block as IB
from text_to_sound_synthesis_tpu.ops.attention import fused_mha, mha_reference
from text_to_sound_synthesis_tpu.ops.quant import quantize_weight

B, Lp, D, H, Skv = 2, 32, 128, 4, 16
M = B * Lp


def _qw(key, K, N, s=0.05):
    return quantize_weight(
        jax.random.normal(jax.random.PRNGKey(key), (K, N), jnp.float32) * s,
        jax.random.normal(jax.random.PRNGKey(key + 100), (N,), jnp.float32) * 0.05,
    )


@pytest.fixture(scope="module")
def data():
    x = jax.random.normal(jax.random.PRNGKey(0), (M, D), jnp.bfloat16)
    mod = jnp.stack([jax.random.normal(jax.random.PRNGKey(1), (D,)) * 0.2,
                     jax.random.normal(jax.random.PRNGKey(2), (D,)) * 0.2])
    return x, mod


def _close(got, want, tol=2e-2):
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    np.testing.assert_allclose(g, w, rtol=tol, atol=tol)


def test_fused_mha_matches_reference(data):
    x, _ = data
    q = x
    k = jax.random.normal(jax.random.PRNGKey(3), (M, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(4), (M, D), jnp.bfloat16)
    got = fused_mha(q, k, v, batch=B, n_head=H, kv_valid=Lp - 5, interpret=True)
    want = mha_reference(q, k, v, batch=B, n_head=H, kv_valid=Lp - 5)
    _close(got, want)


def test_self_attn_block(data):
    x, mod = data
    ws = [_qw(i, D, D) for i in (3, 4, 5, 6)]
    got = IB.self_attn_block(x, mod, *ws, batch=B, n_head=H, q_valid=Lp - 3,
                             interpret=True)
    want = IB.self_attn_block_reference(x, mod, *ws, batch=B, n_head=H,
                                        q_valid=Lp - 3)
    g = np.asarray(got, np.float32).reshape(B, Lp, D)[:, :Lp - 3]
    w = np.asarray(want, np.float32).reshape(B, Lp, D)[:, :Lp - 3]
    np.testing.assert_allclose(g, w, rtol=2e-2, atol=2e-2)


def test_cross_attn_block(data):
    x, mod = data
    ck = jax.random.normal(jax.random.PRNGKey(7), (B * Skv, D), jnp.bfloat16)
    cv = jax.random.normal(jax.random.PRNGKey(8), (B * Skv, D), jnp.bfloat16)
    wq, wp = _qw(9, D, D), _qw(10, D, D)
    got = IB.cross_attn_block(x, mod, ck, cv, wq, wp, batch=B, n_head=H,
                              kv_valid=Skv - 4, interpret=True)
    want = IB.cross_attn_block_reference(x, mod, ck, cv, wq, wp, batch=B,
                                         n_head=H, kv_valid=Skv - 4)
    _close(got, want)


def test_mlp_block(data):
    x, mod = data
    w1, w2 = _qw(11, D, 4 * D), _qw(12, 4 * D, D)
    got = IB.mlp_block(x, mod, w1, w2, block_m=32, interpret=True)
    want = IB.mlp_block_reference(x, mod, w1, w2)
    _close(got, want)


def test_mha_inline_int8_close_to_f32(data):
    """Int8 QK^T/AV attention (T2S_ATTN_INT8 path) tracks the f32 MHA: 8-bit
    score logits perturb softmax mildly; outputs stay within a few percent."""
    x, _ = data
    q = x[:Lp].astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(21), (Lp, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(22), (Lp, D), jnp.bfloat16)
    got = IB._mha_inline_int8(q, k, v, H, Lp - 5)
    want = IB._mha_inline(q, k, v, H, Lp - 5)
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    # relative to the typical output magnitude, not elementwise (softmax
    # outputs cross zero)
    denom = np.maximum(np.abs(w), np.percentile(np.abs(w), 50))
    assert np.max(np.abs(g - w) / denom) < 0.15
    assert np.mean(np.abs(g - w)) / np.mean(np.abs(w)) < 0.02


def test_mlp_block_chunked(data):
    """Chunked-hidden-dim MLP kernel == its oracle exactly, and close to the
    unchunked block (per-chunk scales are a finer quantization, not a drift)."""
    x, mod = data
    w1, w2 = _qw(11, D, 4 * D), _qw(12, 4 * D, D)
    got = IB.mlp_block_chunked(x, mod, w1, w2, block_m=32, n_chunks=4,
                               interpret=True)
    want = IB.mlp_chunked_reference(x, mod, w1, w2, n_chunks=4)
    _close(got, want, tol=5e-3)
    base = IB.mlp_block_reference(x, mod, w1, w2)
    _close(got, base, tol=5e-2)


def test_mlp_block_streamed(data):
    """Streamed-weights MLP kernel (chunk grid dim + scratch carry) == the
    chunked oracle at the same n_chunks, both dynamic and static scales."""
    x, mod = data
    w1, w2 = _qw(11, D, 4 * D), _qw(12, 4 * D, D)
    got = IB.mlp_block_streamed(x, mod, w1, w2, block_m=32, n_chunks=4,
                                interpret=True)
    want = IB.mlp_chunked_reference(x, mod, w1, w2, n_chunks=4)
    _close(got, want, tol=5e-3)
    ss = (0.05, 0.08)
    got_s = IB.mlp_block_streamed(x, mod, w1, w2, block_m=32, n_chunks=4,
                                  interpret=True, static_s=ss)
    want_s = IB.mlp_chunked_reference(x, mod, w1, w2, n_chunks=4, static_s=ss)
    _close(got_s, want_s, tol=5e-3)
    # multiple row blocks exercise the (m, c) grid transition / scratch reuse
    got_mb = IB.mlp_block_streamed(x, mod, w1, w2, block_m=16, n_chunks=4,
                                   interpret=True)
    _close(got_mb, want, tol=5e-3)


def test_multi_dense_matches_single(data):
    """fused_quant_dense_multi's oracle path — shared quantize, many outputs."""
    from text_to_sound_synthesis_tpu.ops.quant import (
        fused_quant_dense_multi,
        quant_dense_reference,
    )

    x, mod = data
    ws = [_qw(i, D, D) for i in (13, 14, 15)]
    outs = fused_quant_dense_multi(x, ws, norm="adaln", mod=mod, block_m=32,
                                   interpret=True)
    for w, got in zip(ws, outs):
        want = quant_dense_reference(x, w, norm="adaln", mod=mod)
        _close(got, want)


def test_attn_pair_block(data):
    """Merged self+cross kernel == the two single-block oracles composed."""
    x, mod = data
    mod2 = jnp.stack([jax.random.normal(jax.random.PRNGKey(21), (D,)) * 0.2,
                      jax.random.normal(jax.random.PRNGKey(22), (D,)) * 0.2])
    mods = jnp.concatenate([mod, mod2], axis=0)
    ws = [_qw(i, D, D) for i in (31, 32, 33, 34, 35, 36)]
    ck = jax.random.normal(jax.random.PRNGKey(23), (B * Skv, D), jnp.bfloat16)
    cv = jax.random.normal(jax.random.PRNGKey(24), (B * Skv, D), jnp.bfloat16)
    got = IB.attn_pair_block(x, mods, ck, cv, *ws, batch=B, n_head=H,
                             q_valid=Lp - 3, kv_valid=Skv - 2, interpret=True)
    want = IB.attn_pair_block_reference(x, mods, ck, cv, *ws, batch=B, n_head=H,
                                        q_valid=Lp - 3, kv_valid=Skv - 2)
    g = np.asarray(got, np.float32).reshape(B, Lp, D)[:, :Lp - 3]
    w = np.asarray(want, np.float32).reshape(B, Lp, D)[:, :Lp - 3]
    np.testing.assert_allclose(g, w, rtol=3e-2, atol=3e-2)


def test_self_attn_block_rows2(data):
    """2 batch rows per grid program == the per-row reference (r4 serving
    default: fewer, larger programs; MHA stays per-row)."""
    x, mod = data
    ws = [_qw(i, D, D) for i in (3, 4, 5, 6)]
    got = IB.self_attn_block(x, mod, *ws, batch=B, n_head=H, q_valid=Lp - 3,
                             interpret=True, rows_per_program=2)
    want = IB.self_attn_block_reference(x, mod, *ws, batch=B, n_head=H,
                                        q_valid=Lp - 3)
    g = np.asarray(got, np.float32).reshape(B, Lp, D)[:, :Lp - 3]
    w = np.asarray(want, np.float32).reshape(B, Lp, D)[:, :Lp - 3]
    np.testing.assert_allclose(g, w, rtol=2e-2, atol=2e-2)


def test_self_attn_block_pair(data):
    """Pair-packed MHA (masks folded into the K/V dequants) == reference.

    Needs head_dim 64 (two heads per 128-lane group): n_head=2 at D=128.
    Covers both dynamic and static quant scales, rows 1 and 2."""
    x, mod = data
    ws = [_qw(i, D, D) for i in (3, 4, 5, 6)]
    for rows, ss in ((1, None), (2, None), (2, (0.05, 0.05))):
        got = IB.self_attn_block(x, mod, *ws, batch=B, n_head=2,
                                 q_valid=Lp - 3, interpret=True,
                                 rows_per_program=rows, mha_mode="pair",
                                 static_s=ss)
        want = IB.self_attn_block_reference(x, mod, *ws, batch=B, n_head=2,
                                            q_valid=Lp - 3, static_s=ss)
        g = np.asarray(got, np.float32).reshape(B, Lp, D)[:, :Lp - 3]
        w = np.asarray(want, np.float32).reshape(B, Lp, D)[:, :Lp - 3]
        np.testing.assert_allclose(g, w, rtol=2e-2, atol=2e-2)


def test_cross_attn_block_pair(data):
    """Cross-attention pair mode (in-kernel slice masks) == reference."""
    x, mod = data
    ck = jax.random.normal(jax.random.PRNGKey(7), (B * Skv, D), jnp.bfloat16)
    cv = jax.random.normal(jax.random.PRNGKey(8), (B * Skv, D), jnp.bfloat16)
    wq, wp = _qw(9, D, D), _qw(10, D, D)
    for rows in (1, 2):
        got = IB.cross_attn_block(x, mod, ck, cv, wq, wp, batch=B, n_head=2,
                                  kv_valid=Skv - 4, interpret=True,
                                  rows_per_program=rows, mha_mode="pair")
        want = IB.cross_attn_block_reference(x, mod, ck, cv, wq, wp, batch=B,
                                             n_head=2, kv_valid=Skv - 4)
        _close(got, want)


def test_pair_mha_exact_vs_inline():
    """The pair-packed MHA helpers == _mha_inline to f32 roundoff (the pair
    trick is a repacking, not an approximation)."""
    H2, hd = 4, 64
    D2 = H2 * hd
    L = 16
    q = jax.random.normal(jax.random.PRNGKey(0), (L, D2), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (L, D2), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (L, D2), jnp.float32)
    want = IB._mha_inline(q, k, v, H2, L - 3)
    got = IB._mha_pair(q, k, v, H2, L - 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    laneD = jnp.arange(D2)[None, :]
    mA = ((laneD % 128) < hd).astype(jnp.float32)
    got2 = IB._mha_pair_premasked(q, k * mA, k * (1 - mA), v * mA,
                                  v * (1 - mA), H2, L - 3)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# W4A8 (nibble-packed int4 weight storage, VERDICT r4 #1 / round 5)
# ---------------------------------------------------------------------------

def _qw4_pair(key, K, N, s=0.05):
    """(packed-W4, unpacked-int8-twin) of the same weight."""
    from text_to_sound_synthesis_tpu.ops.quant import (
        quantize_weight_w4, unpack_weight_w4)
    w = jax.random.normal(jax.random.PRNGKey(key), (K, N), jnp.float32) * s
    b = jax.random.normal(jax.random.PRNGKey(key + 100), (N,), jnp.float32) * 0.05
    p = quantize_weight_w4(w, b)
    return p, unpack_weight_w4(p)


def test_w4_unpack_helper_matches_jnp_twin():
    """The in-kernel _unpack_w4 == the jnp unpack (sign extension incl. -7)."""
    p, u = _qw4_pair(40, D, D)
    lo, hi = IB._unpack_w4(p.w_q)
    full = np.concatenate([np.asarray(lo), np.asarray(hi)], axis=0)
    np.testing.assert_array_equal(full, np.asarray(u.w_q))


def test_self_attn_block_w4_bitexact_vs_unpacked(data):
    """W4 kernel (in-VMEM unpack + two half-K int32 dots) is BIT-EXACT vs the
    int8 kernel on the unpacked twin: int32 accumulation makes the split dot
    exact, so W4 changes only weight STORAGE, never the math."""
    x, mod = data
    packed, unpacked = zip(*[_qw4_pair(i, D, D) for i in (41, 42, 43, 44)])
    got = IB.self_attn_block(x, mod, *packed, batch=B, n_head=H,
                             q_valid=Lp - 3, interpret=True, w4=True)
    want = IB.self_attn_block(x, mod, *unpacked, batch=B, n_head=H,
                              q_valid=Lp - 3, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cross_attn_block_w4_bitexact_vs_unpacked(data):
    x, mod = data
    ck = jax.random.normal(jax.random.PRNGKey(7), (B * Skv, D), jnp.bfloat16)
    cv = jax.random.normal(jax.random.PRNGKey(8), (B * Skv, D), jnp.bfloat16)
    (pq, uq), (pp, up) = _qw4_pair(45, D, D), _qw4_pair(46, D, D)
    got = IB.cross_attn_block(x, mod, ck, cv, pq, pp, batch=B, n_head=H,
                              kv_valid=Skv - 4, interpret=True, w4=True)
    want = IB.cross_attn_block(x, mod, ck, cv, uq, up, batch=B, n_head=H,
                               kv_valid=Skv - 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mlp_block_w4_bitexact_vs_unpacked(data):
    x, mod = data
    (p1, u1), (p2, u2) = _qw4_pair(47, D, 4 * D), _qw4_pair(48, 4 * D, D)
    for ss in (None, (0.05, 0.08)):
        got = IB.mlp_block(x, mod, p1, p2, block_m=32, interpret=True,
                           w4=True, static_s=ss)
        want = IB.mlp_block(x, mod, u1, u2, block_m=32, interpret=True,
                            static_s=ss)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

"""ops/quant.py: fused int8 dense — kernel vs jnp oracle vs f32 math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.ops import quant


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


def test_quantize_weight_roundtrip():
    w = _rand(0, (64, 256), 0.05)
    q = quant.quantize_weight(w)
    deq = q.w_q.astype(jnp.float32) * q.scale
    err = np.abs(np.asarray(deq - w)).max()
    amax = np.abs(np.asarray(w)).max(axis=0)
    assert err <= (amax.max() / 127.0) * 0.51 + 1e-8  # half-ulp of the grid


def test_quantize_weight_w4_pack_unpack_exact():
    """Nibble pack -> unpack is lossless over the full int4 grid [-7, 7]."""
    w = _rand(1, (64, 256), 0.05)
    b = _rand(2, (256,), 0.05)
    p = quant.quantize_weight_w4(w, b)
    assert p.w_q.shape == (32, 256) and p.w_q.dtype == jnp.int8
    u = quant.unpack_weight_w4(p)
    # direct (unpacked) int4 quantization as the oracle
    wf = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(wf).max(axis=0, keepdims=True), 1e-8) / 7.0
    w4 = np.clip(np.round(wf / scale), -7, 7).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(u.w_q), w4)
    np.testing.assert_allclose(np.asarray(u.scale), scale, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(u.bias).ravel(), np.asarray(b))
    # values cover the grid edges (otherwise the sign-extension test is weak)
    assert w4.min() == -7 and w4.max() == 7


def test_quantize_weight_w4_dequant_error_bound():
    w = _rand(3, (64, 256), 0.05)
    u = quant.unpack_weight_w4(quant.quantize_weight_w4(w))
    deq = u.w_q.astype(jnp.float32) * u.scale
    err = np.abs(np.asarray(deq - w)).max()
    amax = np.abs(np.asarray(w)).max()
    assert err <= (amax / 7.0) * 0.51 + 1e-8  # half-ulp of the int4 grid


@pytest.mark.parametrize("norm,act,use_res", [
    ("none", "none", False),
    ("adaln", "none", False),
    ("adaln", "gelu2", True),
    ("ln", "gelu2", False),
])
def test_reference_matches_f32(norm, act, use_res):
    M, K, N = 128, 128, 256
    x = _rand(1, (M, K))
    w = _rand(2, (K, N), 0.05)
    b = _rand(3, (N,), 0.1)
    qw = quant.quantize_weight(w, b)
    mod = jnp.stack([_rand(4, (K,), 0.2), _rand(5, (K,), 0.2)])

    # f32 exact twin of the fused op's math
    h = x
    if norm != "none":
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mean) ** 2, axis=-1, keepdims=True)
        hn = (h - mean) * jax.lax.rsqrt(var + 1e-6)
        h = hn * (1.0 + mod[0:1]) + mod[1:2] if norm == "adaln" else hn * mod[0:1] + mod[1:2]
    y = h @ w + b
    if act == "gelu2":
        y = y * jax.nn.sigmoid(1.702 * y)
    res = _rand(6, (M, N)) if use_res else None
    if use_res:
        y = y + res

    got = quant.quant_dense_reference(
        x, qw, norm=norm, mod=mod if norm != "none" else None, act=act,
        residual=res, out_dtype=jnp.float32)
    scale = float(np.abs(np.asarray(y)).mean()) + 1e-6
    rel = float(np.abs(np.asarray(got) - np.asarray(y)).mean()) / scale
    assert rel < 0.02, rel  # int8 dynamic-quant error budget


@pytest.mark.parametrize("norm,act,use_res", [
    ("none", "none", False),
    ("adaln", "gelu2", False),
    ("none", "none", True),
    ("ln", "none", False),
])
def test_kernel_matches_reference(norm, act, use_res):
    M, K, N = 256, 256, 256
    x = _rand(7, (M, K)).astype(jnp.bfloat16)
    w = _rand(8, (K, N), 0.05)
    b = _rand(9, (N,), 0.1)
    qw = quant.quantize_weight(w, b)
    mod = jnp.stack([_rand(10, (K,), 0.2), _rand(11, (K,), 0.2)])
    res = _rand(12, (M, N)).astype(jnp.bfloat16) if use_res else None
    kw = dict(norm=norm, mod=mod if norm != "none" else None, act=act,
              residual=res, out_dtype=jnp.float32)

    want = quant.quant_dense_reference(x, qw, **kw)
    got = quant.fused_quant_dense(x, qw, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_kernel_grid_tiling():
    """N wider than one block: per-column scales must follow the grid."""
    M, K, N = 128, 128, 1024
    x = _rand(13, (M, K)).astype(jnp.bfloat16)
    w = _rand(14, (K, N), 0.05)
    # per-column magnitudes vary wildly -> catches scale/block mismatches
    w = w * (10.0 ** jnp.linspace(-2, 0, N)[None, :])
    qw = quant.quantize_weight(w)
    want = quant.quant_dense_reference(x, qw, out_dtype=jnp.float32)
    got = quant.fused_quant_dense(x, qw, interpret=True, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)

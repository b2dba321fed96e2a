"""Parity tests for the fused GroupNorm+swish+conv3x3 Pallas kernel.

The kernel is a measured perf NEGATIVE vs XLA's convolution_convert_fusion
(see the module docstring / tools/bench_gn_conv.py) and ships default-OFF;
these tests keep it correct as in-tree evidence, exercising it in interpreter
mode on CPU: the clamped-BlockSpec halo scheme, the conv zero ring, per-batch
group statistics, and the custom VJP.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_to_sound_synthesis_tpu.ops.fused_gn_conv import (
    fused_gn_eligible,
    gn_affine,
    gn_swish_conv,
    gn_swish_conv_reference,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("T2S_FUSED_GN", "interpret")


def _inputs(B, H, W, C, Co, dtype, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, C), dtype)
    gamma = jnp.asarray(rng.randn(C), jnp.float32)
    beta = jnp.asarray(rng.randn(C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, C, Co) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(Co), jnp.float32)
    return x, gamma, beta, k, b


@pytest.mark.parametrize("shape", [
    (2, 8, 16, 32, 48, 8),
    (1, 5, 53, 64, 64, 32),    # odd W, single batch, production-like groups
    (2, 3, 7, 16, 16, 4),      # tiny, W smaller than the sublane tile
])
def test_forward_matches_reference_f32(shape):
    B, H, W, C, Co, G = shape
    x, gamma, beta, k, b = _inputs(B, H, W, C, Co, jnp.float32)
    y = gn_swish_conv(x, gamma, beta, k, b, groups=G)
    yr = gn_swish_conv_reference(x, gamma, beta, k, b, groups=G)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)


def test_forward_matches_reference_bf16():
    x, gamma, beta, k, b = _inputs(2, 6, 10, 16, 16, jnp.bfloat16)
    y = gn_swish_conv(x, gamma, beta, k, b, groups=4)
    yr = gn_swish_conv_reference(x, gamma, beta, k, b, groups=4)
    # reference contracts in f32 on bf16-rounded operands == the MXU path
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yr, np.float32), rtol=0.05,
                               atol=0.05)


def test_conv_zero_ring_matches_explicit_pad():
    """The clamped halo rows must act exactly like conv zero padding: compare
    against an explicit pad of the activated tensor."""
    B, H, W, C, Co, G = 1, 4, 6, 8, 8, 2
    x, gamma, beta, k, b = _inputs(B, H, W, C, Co, jnp.float32, seed=3)
    scale, shift = gn_affine(x, gamma, beta, G)
    a = x * scale[:, None, None, :] + shift[:, None, None, :]
    a = a * jax.nn.sigmoid(a)
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y_manual = jax.lax.conv_general_dilated(
        ap, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_manual = y_manual + b[None, None, None, :]
    y = gn_swish_conv(x, gamma, beta, k, b, groups=G)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_manual),
                               rtol=1e-4, atol=1e-5)


def test_per_batch_statistics_differ():
    """Each batch element must be normalized with its own group stats."""
    B, H, W, C, Co, G = 2, 4, 8, 8, 8, 2
    x, gamma, beta, k, b = _inputs(B, H, W, C, Co, jnp.float32, seed=5)
    x = x.at[1].mul(10.0).at[1].add(3.0)
    y = gn_swish_conv(x, gamma, beta, k, b, groups=G)
    y0 = gn_swish_conv(x[0:1], gamma, beta, k, b, groups=G)
    y1 = gn_swish_conv(x[1:2], gamma, beta, k, b, groups=G)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y0[0]), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y[1]), np.asarray(y1[0]), rtol=1e-5,
                               atol=1e-5)


def test_multi_row_block_halo_path(monkeypatch):
    """Force bh < H (several row-block programs) so the clamped top/bottom
    halo specs and the edge-masking predicates actually execute — at the
    default VMEM budget every test-sized shape fits one block, but the
    flagship decoder shapes (H=80) do tile."""
    import text_to_sound_synthesis_tpu.ops.fused_gn_conv as m

    monkeypatch.setattr(m, "_VMEM_BUDGET", 220 * 1024)
    B, H, W, C, Co, G = 2, 8, 16, 32, 32, 8
    x, gamma, beta, k, b = _inputs(B, H, W, C, Co, jnp.float32, seed=11)
    bh = m._pick_bh(H, W, C, Co, 4)
    assert 1 <= bh < H, bh
    y = gn_swish_conv(x, gamma, beta, k, b, groups=G)
    yr = gn_swish_conv_reference(x, gamma, beta, k, b, groups=G)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_reference_grads():
    B, H, W, C, Co, G = 2, 6, 8, 16, 16, 4
    x, gamma, beta, k, b = _inputs(B, H, W, C, Co, jnp.float32, seed=7)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.square(fn(*a, groups=G)))

    ga = jax.grad(loss(gn_swish_conv), argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, k, b)
    gr = jax.grad(loss(gn_swish_conv_reference), argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, k, b)
    for u, v in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=1e-4,
                                   atol=1e-4)


def test_eligibility_gate(monkeypatch):
    monkeypatch.setenv("T2S_FUSED_GN", "0")
    assert not fused_gn_eligible((2, 8, 16, 128), 128)
    monkeypatch.setenv("T2S_FUSED_GN", "interpret")
    assert fused_gn_eligible((2, 8, 16, 32), 48)
    monkeypatch.delenv("T2S_FUSED_GN")
    # default is OFF (measured negative)
    assert not fused_gn_eligible((2, 8, 16, 128), 128)

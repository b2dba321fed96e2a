"""Direct parity against the reference's OWN diffusion algebra.

Strongest oracle available: call the reference ``DiffusionTransformer`` methods
(unbound, on a stub carrying the registered buffers) with the same inputs as
our f32 log-space ops and require agreement. This closes the loop beyond the
independent f64 oracle in test_diffusion_math.py.
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF), reason="reference not mounted"
)

from text_to_sound_synthesis_tpu.ops import diffusion as dd


def _ref_module():
    sys.path.append(f"{REF}/Diffsound")
    from sound_synthesis.modeling.transformers import diffusion_transformer as RT
    return RT


def _ref_stub(RT, T, K):
    """Stub with the reference's registered buffers (its __init__ at :202-231)."""
    at, bt, ct, att, btt, ctt = RT.alpha_schedule(T, N=K)
    f = lambda x: torch.tensor(x.astype("float64"))
    log_at, log_bt, log_ct = torch.log(f(at)), torch.log(f(bt)), torch.log(f(ct))
    log_catt, log_cbtt, log_cctt = torch.log(f(att)), torch.log(f(btt)), torch.log(f(ctt))
    ns = SimpleNamespace(
        num_timesteps=T,
        num_classes=K,
        content_seq_len=None,  # set per call
        log_at=log_at.float(), log_bt=log_bt.float(), log_ct=log_ct.float(),
        log_cumprod_at=log_catt.float(), log_cumprod_bt=log_cbtt.float(),
        log_cumprod_ct=log_cctt.float(),
        log_1_min_ct=RT.log_1_min_a(log_ct).float(),
        log_1_min_cumprod_ct=RT.log_1_min_a(log_cctt).float(),
    )
    import types as _types

    ns.q_pred = _types.MethodType(RT.DiffusionTransformer.q_pred, ns)
    ns.q_pred_one_timestep = _types.MethodType(
        RT.DiffusionTransformer.q_pred_one_timestep, ns
    )
    return ns


T, K, B, L = 10, 7, 2, 6


@pytest.fixture(scope="module")
def setup():
    RT = _ref_module()
    stub = _ref_stub(RT, T, K)
    stub.content_seq_len = L
    sched = dd.make_schedule(T, K)
    rng = np.random.default_rng(0)
    # reference layout: (B, K, L); ours: (B, L, K)
    p0 = rng.random((B, L, K)).astype(np.float64)
    p0[..., -1] = 1e-30
    p0 /= p0.sum(-1, keepdims=True)
    log_p0 = np.log(p0).astype(np.float32)
    xt = rng.integers(0, K, (B, L))
    return RT, stub, sched, log_p0, xt


def test_schedule_buffers_match(setup):
    RT, stub, sched, *_ = setup
    np.testing.assert_allclose(np.asarray(sched.log_at), stub.log_at.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.log_cumprod_ct), stub.log_cumprod_ct.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.log_1_min_cumprod_ct),
                               stub.log_1_min_cumprod_ct.numpy(), atol=1e-6)


def test_q_pred_matches_reference(setup):
    RT, stub, sched, log_p0, xt = setup
    for t_s in [0, 4, T - 1]:
        t = torch.full((B,), t_s, dtype=torch.long)
        ref_in = torch.from_numpy(np.transpose(log_p0, (0, 2, 1)))
        want = RT.DiffusionTransformer.q_pred(stub, ref_in, t).numpy()
        got = np.asarray(dd.q_pred(sched, jnp.asarray(log_p0), jnp.full((B,), t_s, jnp.int32)))
        np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), want, atol=2e-5)


def test_q_posterior_matches_reference(setup):
    RT, stub, sched, log_p0, xt = setup
    log_xt = dd.index_to_log_onehot(jnp.asarray(xt), K)
    ref_xt = torch.from_numpy(np.transpose(np.asarray(log_xt), (0, 2, 1)))
    ref_p0 = torch.from_numpy(np.transpose(log_p0, (0, 2, 1)))
    for t_s in [0, 3, T - 1]:
        t = torch.full((B,), t_s, dtype=torch.long)
        want = RT.DiffusionTransformer.q_posterior(stub, ref_p0, ref_xt, t).numpy()
        got = np.asarray(dd.q_posterior(sched, jnp.asarray(log_p0), log_xt,
                                        jnp.full((B,), t_s, jnp.int32)))
        np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), want, atol=3e-5)


def test_fused_index_path_matches_reference(setup):
    """The fused sampler's index-based posterior == the reference q_posterior."""
    from text_to_sound_synthesis_tpu.ops import fused_sampler as fs
    import jax

    RT, stub, sched, log_p0, xt = setup
    # build raw logits whose log_softmax+mask matches log_p0's token part
    logits = log_p0[..., :-1].copy()
    for t_s in [1, 5, T - 1]:
        coeffs = fs.step_coeffs(sched, jnp.asarray(t_s))
        _, got = fs.p_sample_from_indices(jnp.asarray(logits), jnp.asarray(xt, jnp.int32),
                                          coeffs, jax.random.PRNGKey(0),
                                          return_log_probs=True)
        lp = torch.log_softmax(torch.from_numpy(logits).double(), dim=-1).float()
        ref_p0_t = torch.cat([lp, torch.full((B, L, 1), -70.0)], dim=-1)
        ref_p0_t = torch.clamp(ref_p0_t, -70, 0).permute(0, 2, 1)
        log_xt = dd.index_to_log_onehot(jnp.asarray(xt), K)
        ref_xt = torch.from_numpy(np.transpose(np.asarray(log_xt), (0, 2, 1)))
        t = torch.full((B,), t_s, dtype=torch.long)
        want = RT.DiffusionTransformer.q_posterior(stub, ref_p0_t, ref_xt, t).numpy()
        np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 2, 1)), want, atol=3e-5)

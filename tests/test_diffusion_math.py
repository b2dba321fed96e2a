"""Parity of the f32 TPU diffusion algebra vs an independent float64 numpy oracle.

The oracle below implements the mask-and-replace Markov chain from first
principles (explicit K x K transition matrices in float64), NOT the reference's
log-space shortcut — so agreement checks the algebra, not a transcription.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.ops import diffusion as dd


# ---------------------------------------------------------------------------
# float64 oracle: explicit transition matrices
# ---------------------------------------------------------------------------

class Oracle:
    """Q_t[i, j] = q(x_t = i | x_{t-1} = j) built densely in float64."""

    def __init__(self, T, K, ctt_T=0.9):
        self.T, self.K = T, K
        at, bt, ct, att, btt, ctt = dd.linear_alpha_schedule(T, N=K, ctt_T=ctt_T)
        self.at, self.bt, self.ct = at, bt, ct
        self.att, self.btt, self.ctt = att, btt, ctt

    def step_matrix(self, t):
        K = self.K
        Q = np.full((K, K), self.bt[t], dtype=np.float64)
        Q[np.arange(K - 1), np.arange(K - 1)] += self.at[t]
        Q[:, K - 1] = 0.0          # mask never un-masks
        Q[K - 1, :K - 1] = self.ct[t]
        Q[K - 1, K - 1] = 1.0
        Q[:K - 1, K - 1] = 0.0
        return Q

    def cum_matrix_product(self, t):
        """prod_{s<=t} Q_s; t = -1 -> identity. Only approximately equals the
        closed form (see test_cumulative_matches_schedule_coeffs)."""
        Q = np.eye(self.K, dtype=np.float64)
        for s in range(t + 1):
            Q = self.step_matrix(s) @ Q
        return Q

    def cum_matrix(self, t):
        """Closed-form cumulative kernel from att/btt/ctt — this is what the
        reference actually uses (it never forms the product)."""
        K = self.K
        if t < 0:
            return np.eye(K, dtype=np.float64)
        Q = np.full((K, K), self.btt[t], dtype=np.float64)
        Q[np.arange(K - 1), np.arange(K - 1)] += self.att[t]
        Q[:, K - 1] = 0.0
        Q[K - 1, :K - 1] = self.ctt[t]
        Q[K - 1, K - 1] = 1.0
        Q[:K - 1, K - 1] = 0.0
        return Q

    def q_pred(self, p0, t):
        """p0: (L, K) distribution over x0 -> distribution over x_t."""
        return (self.cum_matrix(t) @ p0.T).T

    def q_posterior(self, p0_pred, xt_idx, t):
        """Dense Bayes: q(x_{t-1}=j | x_t, x0 ~ p0_pred), (L, K)."""
        L, K = p0_pred.shape
        out = np.zeros((L, K), dtype=np.float64)
        Q_t = self.step_matrix(t)
        Qcum_prev = self.cum_matrix(t - 1)
        Qcum = self.cum_matrix(t)
        for l in range(L):
            i = xt_idx[l]
            # sum over x0: p(x0) * q(xt=i, x_{t-1}=j | x0)
            num = np.zeros(K)
            for x0 in range(K):
                p_x0 = p0_pred[l, x0]
                joint = Q_t[i, :] * Qcum_prev[:, x0]   # over j
                denom = Qcum[i, x0]
                if denom > 0:
                    num += p_x0 * joint / denom
            out[l] = num
        return out


def _log_onehot(idx, K):
    oh = np.eye(K)[idx]
    return np.log(np.clip(oh, 1e-30, None)).astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    T, K, L, B = 10, 7, 5, 2
    sched = dd.make_schedule(T, K)
    oracle = Oracle(T, K)
    return T, K, L, B, sched, oracle


def test_schedule_probabilities_sum_to_one(setup):
    """Token columns sum to exactly 1 - bt: the reference spreads the uniform
    share over N = K classes (incl. MASK) but MASK never receives it
    (alpha_schedule, diffusion_transformer.py:143). The mask column is exact."""
    T, K, *_ , sched, oracle = setup
    for t in range(T):
        Q = oracle.step_matrix(t)
        np.testing.assert_allclose(Q[:, : K - 1].sum(axis=0), 1.0 - oracle.bt[t], atol=1e-12)
        np.testing.assert_allclose(Q[:, K - 1].sum(), 1.0, atol=1e-12)


def test_cumulative_matches_schedule_coeffs(setup):
    """Closed-form cumulative coefficients track the dense matrix product.

    Not exact: the per-step missing-bt mass (see previous test) compounds, so
    the closed form the reference uses drifts from the true product by O(T·bt).
    """
    T, K, *_ , sched, oracle = setup
    for t in range(T):
        Qc = oracle.cum_matrix_product(t)
        # ~7.5% worst-case drift at K=7; shrinks as 1/K (K=257 in production).
        np.testing.assert_allclose(Qc[0, 0], oracle.att[t] + oracle.btt[t], rtol=0.1, atol=1e-8)
        np.testing.assert_allclose(Qc[1, 0], oracle.btt[t], rtol=0.1, atol=1e-8)
        np.testing.assert_allclose(Qc[K - 1, 0], oracle.ctt[t], rtol=0.1, atol=1e-8)


def test_q_pred_matches_oracle(setup, rng):
    T, K, L, B, sched, oracle = setup
    x0 = rng.integers(0, K - 1, size=(B, L))
    log_x0 = jnp.asarray(np.stack([_log_onehot(x, K) for x in x0]))
    for t_scalar in [0, 3, T - 1]:
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        got = np.exp(np.asarray(dd.q_pred(sched, log_x0, t)))
        for b in range(B):
            want = oracle.q_pred(np.eye(K)[x0[b]], t_scalar)
            np.testing.assert_allclose(got[b], want, atol=2e-6)


def test_q_pred_minus_one_is_identity(setup, rng):
    T, K, L, B, sched, _ = setup
    x0 = rng.integers(0, K, size=(B, L))
    log_x0 = jnp.asarray(np.stack([_log_onehot(x, K) for x in x0]))
    t = jnp.full((B,), -1, dtype=jnp.int32)
    got = np.asarray(dd.q_pred(sched, log_x0, t))
    np.testing.assert_allclose(got, np.asarray(log_x0), atol=1e-5)


def test_q_pred_one_timestep_matches_oracle(setup, rng):
    T, K, L, B, sched, oracle = setup
    # Apply the one-step kernel to an arbitrary distribution.
    p = rng.random((B, L, K))
    p /= p.sum(-1, keepdims=True)
    log_p = jnp.asarray(np.log(p).astype(np.float32))
    for t_scalar in [0, 4, T - 1]:
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        got = np.exp(np.asarray(dd.q_pred_one_timestep(sched, log_p, t)))
        Q = oracle.step_matrix(t_scalar)
        # NOTE the reference's one-step op is NOT a matrix product with Q: it
        # reuses the evaluated point x_t in both slots. For a distribution p it
        # computes elementwise: tok_k -> at*p_k + bt,  mask -> (1-ct)*p_mask + ct.
        want = np.empty_like(got)
        for b in range(B):
            want[b, :, :K-1] = oracle.at[t_scalar] * p[b, :, :K-1] + oracle.bt[t_scalar]
            want[b, :, K-1] = (1 - oracle.ct[t_scalar]) * p[b, :, K-1] + oracle.ct[t_scalar]
        np.testing.assert_allclose(got, want, atol=2e-6)


def _ref_posterior_f64(oracle, log_p0, xt_idx, t):
    """The reference-style factorized posterior, independently re-implemented in
    float64 probability space (L, K) — validates the f32 log-space version.
    """
    K = oracle.K
    L = xt_idx.shape[0]
    p0 = np.exp(np.asarray(log_p0, dtype=np.float64))
    out = np.zeros((L, K), dtype=np.float64)
    att_prev = oracle.att[t - 1] if t > 0 else 1.0
    btt_prev = oracle.btt[t - 1] if t > 0 else 0.0
    ctt_prev = oracle.ctt[t - 1] if t > 0 else 0.0
    for l in range(L):
        i = xt_idx[l]
        if i == K - 1:  # observed mask
            qt = np.concatenate([np.full(K - 1, oracle.ctt[t]), [1.0]])
            qt1 = np.concatenate([np.full(K - 1, oracle.ct[t]), [1.0]])
        else:
            qt = np.full(K, oracle.btt[t])
            qt[i] += oracle.att[t]
            qt[K - 1] = 1e-30
            qt1 = np.full(K, oracle.bt[t])
            qt1[i] += oracle.at[t]
            qt1[K - 1] = 1e-30
        u = p0[l] / qt
        Z = u.sum()
        un = u / Z
        prev = np.empty(K)
        prev[: K - 1] = att_prev * un[: K - 1] + btt_prev
        prev[K - 1] = (1.0 - ctt_prev) * un[K - 1] + ctt_prev
        out[l] = prev * qt1 * Z
    return np.clip(out, np.exp(-70.0), 1.0)


def test_q_posterior_f32_matches_f64_algorithm(setup, rng):
    """f32 log-space q_posterior tracks the same algorithm run in f64 prob space
    — the 'f64 log_softmax on TPU' parity requirement from SURVEY.md §7."""
    T, K, L, B, sched, oracle = setup
    p0 = rng.random((B, L, K))
    p0[..., -1] = 1e-31  # model never predicts mask (predict_start appends -70)
    p0 /= p0.sum(-1, keepdims=True)
    log_p0 = jnp.asarray(np.log(p0).astype(np.float32))

    for t_scalar in [1, 5, T - 1]:
        xt = rng.integers(0, K, size=(B, L))  # includes mask states
        log_xt = jnp.asarray(np.stack([_log_onehot(x, K) for x in xt]))
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        got = np.exp(np.asarray(dd.q_posterior(sched, log_p0, log_xt, t)))
        for b in range(B):
            want = _ref_posterior_f64(oracle, np.log(p0[b]), xt[b], t_scalar)
            np.testing.assert_allclose(got[b], want, atol=3e-5)


def test_q_posterior_equals_dense_bayes(setup, rng):
    """The factorized posterior == exact dense Bayes when p0(MASK) = 0.

    (With p0(MASK) merely tiny-but-representable, the reference's log(1e-30)
    mask-column placeholder leaks an O(p0_mask/1e-30 / Z) term — covered by the
    f64-algorithm parity test above. Here we zero it below f32 resolution to
    check the pure algebra.) Posterior totals are < 1 at large t by the chain's
    inherent missing-bt mass; both sides agree on that too.
    """
    T, K, L, B, sched, oracle = setup
    p0 = rng.random((B, L, K))
    p0[..., -1] = 1e-300  # exp() underflows to 0 in f32
    p0 /= p0.sum(-1, keepdims=True)
    log_p0 = jnp.asarray(np.log(p0).astype(np.float32))

    for t_scalar in [1, 5, T - 1]:
        xt = rng.integers(0, K, size=(B, L))
        log_xt = jnp.asarray(np.stack([_log_onehot(x, K) for x in xt]))
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        got = np.exp(np.asarray(dd.q_posterior(sched, log_p0, log_xt, t)))
        for b in range(B):
            want = oracle.q_posterior(p0[b], xt[b], t_scalar)
            np.testing.assert_allclose(got[b], want, atol=1e-5)


def test_q_posterior_t0_recovers_x0(setup, rng):
    """At t=0 the posterior over x_{-1} should concentrate on the x0 prediction."""
    T, K, L, B, sched, _ = setup
    x0 = rng.integers(0, K - 1, size=(B, L))
    p0 = np.full((B, L, K), 1e-30)
    p0[np.arange(B)[:, None], np.arange(L)[None], x0] = 1.0
    log_p0 = jnp.asarray(np.log(p0).astype(np.float32))
    xt = rng.integers(0, K, size=(B, L))
    log_xt = jnp.asarray(np.stack([_log_onehot(x, K) for x in xt]))
    t = jnp.zeros((B,), dtype=jnp.int32)
    got = np.asarray(dd.log_onehot_to_index(dd.q_posterior(sched, log_p0, log_xt, t)))
    np.testing.assert_array_equal(got, x0)


def test_log_sample_categorical_distribution():
    key = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.asarray([[[0.7, 0.2, 0.1]]] * 4000, dtype=jnp.float32))
    log_sample = dd.log_sample_categorical(key, logits)
    idx = np.asarray(dd.log_onehot_to_index(log_sample)).ravel()
    freq = np.bincount(idx, minlength=3) / len(idx)
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.03)


def test_multinomial_kl_zero_for_identical(rng):
    p = rng.random((2, 3, 5))
    p /= p.sum(-1, keepdims=True)
    lp = jnp.asarray(np.log(p).astype(np.float32))
    kl = np.asarray(dd.multinomial_kl(lp, lp))
    np.testing.assert_allclose(kl, 0.0, atol=1e-6)


def test_kl_matches_manual(rng):
    p = rng.random((1, 2, 4)); p /= p.sum(-1, keepdims=True)
    q = rng.random((1, 2, 4)); q /= q.sum(-1, keepdims=True)
    got = np.asarray(dd.multinomial_kl(jnp.log(jnp.asarray(p)), jnp.log(jnp.asarray(q))))
    want = (p * (np.log(p) - np.log(q))).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_index_to_log_onehot_range_guard():
    # eager out-of-range id -> ValueError (the reference's assert,
    # diffusion_transformer.py:46-47)
    with pytest.raises(ValueError, match="out of range"):
        dd.index_to_log_onehot(jnp.asarray([[0, 4]]), 4)
    # in-range eager: fine
    out = dd.index_to_log_onehot(jnp.asarray([[0, 3]]), 4)
    assert out.shape == (1, 2, 4)

    # a concrete CONSTANT closed over by a jitted fn: jnp ops on it stage
    # into the jaxpr, so the guard must reduce on the host (regression for
    # the ConcretizationTypeError this once raised)
    const = jnp.asarray([[1, 2]])
    jitted = jax.jit(lambda: dd.index_to_log_onehot(const, 4))
    assert jitted().shape == (1, 2, 4)

    # traced values skip the guard (no concretization error)
    f = jax.jit(lambda x: dd.index_to_log_onehot(x, 4))
    assert f(jnp.asarray([[1, 3]])).shape == (1, 2, 4)

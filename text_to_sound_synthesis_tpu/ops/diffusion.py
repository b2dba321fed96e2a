"""Discrete (multinomial) diffusion algebra in log space — pure JAX, TPU-first.

Re-derivation of the VQ-Diffusion mask-and-replace Markov chain used by the
reference (``Diffsound/sound_synthesis/modeling/transformers/diffusion_transformer.py``):

* forward kernel over K classes (K-1 codebook tokens + 1 MASK):
  ``q(x_t | x_{t-1}) = a_t * x_{t-1} + b_t * uniform + c_t * MASK``
* cumulative products closed-form (``q_pred``), one-step (``q_pred_one_timestep``)
* reverse posterior ``q(x_{t-1} | x_t, x0_hat)`` (``q_posterior``)
* Gumbel-argmax categorical sampling in log space.

Design differences from the reference (deliberate, TPU-first):

* Layout is ``(batch, positions L, classes K)`` — classes on the TPU lane axis so
  per-position reductions (logsumexp, argmax, cumsum) vectorize on the VPU. The
  reference uses (B, K, L).
* Everything is float32 with logsumexp-stabilized ``log_add_exp``; the reference
  builds schedules and takes log_softmax in float64 (diffusion_transformer.py:202-213,
  285), which is slow on TPU. Parity vs a float64 numpy oracle is enforced in
  tests/test_diffusion_math.py.
* Schedules are plain pytrees (no registered buffers); time indexing uses static
  gathers so the whole sampler fuses into one ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "LOG_EPS",
    "MIN_LOGP",
    "DiffusionSchedule",
    "linear_alpha_schedule",
    "make_schedule",
    "index_to_log_onehot",
    "log_onehot_to_index",
    "log_add_exp",
    "q_pred",
    "q_pred_one_timestep",
    "q_posterior",
    "log_sample_categorical",
    "q_sample",
    "multinomial_kl",
    "log_categorical",
]

#: log(1e-30) — the "log zero" used when converting one-hots to log space.
LOG_EPS = float(np.log(1e-30))
#: hard floor applied to model log-probabilities (reference clamps at -70).
MIN_LOGP = -70.0


class DiffusionSchedule(NamedTuple):
    """Log-space transition coefficients.

    Per-step arrays have length T; cumulative arrays have length T+1 with the
    convention that index T (reachable as ``t = -1`` via the wraparound in
    ``q_pred``) encodes the identity transition: ``att[T]=1, btt[T]=ctt[T]=0``.
    """

    log_at: jnp.ndarray            # (T,)
    log_bt: jnp.ndarray            # (T,)
    log_ct: jnp.ndarray            # (T,)
    log_1_min_ct: jnp.ndarray      # (T,)
    log_cumprod_at: jnp.ndarray    # (T+1,)
    log_cumprod_bt: jnp.ndarray    # (T+1,)
    log_cumprod_ct: jnp.ndarray    # (T+1,)
    log_1_min_cumprod_ct: jnp.ndarray  # (T+1,)

    @property
    def num_timesteps(self) -> int:
        return self.log_at.shape[0]


def linear_alpha_schedule(
    time_step: int,
    N: int,
    att_1: float = 0.99999,
    att_T: float = 0.000009,
    ctt_1: float = 0.000009,
    ctt_T: float = 0.9,
):
    """Linear keep/mask probability schedule (float64 numpy).

    Returns ``(at, bt, ct, att, btt, ctt)``: per-step keep ``at``, uniform-replace
    ``bt`` (per class, hence /N), mask ``ct``, and their cumulative counterparts
    (cumulatives shifted so index t covers steps 0..t, with a trailing identity
    entry). Matches ``alpha_schedule`` (diffusion_transformer.py:122-151); the
    mask-only / uniform-only variants of the reference are the same formula with
    ``ctt_T=0.99999`` / ``ctt_T≈0.1``.
    """
    steps = np.arange(time_step, dtype=np.float64) / (time_step - 1)
    att_lin = steps * (att_T - att_1) + att_1
    att_full = np.concatenate(([1.0], att_lin))
    at = att_full[1:] / att_full[:-1]

    ctt_lin = steps * (ctt_T - ctt_1) + ctt_1
    ctt_full = np.concatenate(([0.0], ctt_lin))
    one_minus_ct = (1.0 - ctt_full[1:]) / (1.0 - ctt_full[:-1])
    ct = 1.0 - one_minus_ct

    bt = (1.0 - at - ct) / N
    att = np.concatenate((att_full[1:], [1.0]))
    ctt = np.concatenate((ctt_full[1:], [0.0]))
    btt = (1.0 - att - ctt) / N
    return at, bt, ct, att, btt, ctt


_SCHEDULE_KINDS = {
    # kind -> ctt_T (terminal mask probability)
    "mask_and_uniform": 0.9,
    "mask_only": 0.99999,
    "uniform_only": 0.1,
}


def make_schedule(
    time_step: int,
    num_classes: int,
    kind: str = "mask_and_uniform",
    dtype=jnp.float32,
) -> DiffusionSchedule:
    """Build the log-space schedule. ``num_classes`` includes the MASK class."""
    if kind not in _SCHEDULE_KINDS:
        raise ValueError(f"unknown schedule kind {kind!r}; options: {sorted(_SCHEDULE_KINDS)}")
    at, bt, ct, att, btt, ctt = linear_alpha_schedule(
        time_step, N=num_classes, ctt_T=_SCHEDULE_KINDS[kind]
    )
    with np.errstate(divide="ignore"):
        log_at, log_bt, log_ct = np.log(at), np.log(bt), np.log(ct)
        log_att, log_btt, log_ctt = np.log(att), np.log(btt), np.log(ctt)
        log_1_min_ct = np.log(1.0 - np.exp(log_ct) + 1e-40)
        log_1_min_ctt = np.log(1.0 - np.exp(log_ctt) + 1e-40)
    return DiffusionSchedule(
        log_at=jnp.asarray(log_at, dtype),
        log_bt=jnp.asarray(log_bt, dtype),
        log_ct=jnp.asarray(log_ct, dtype),
        log_1_min_ct=jnp.asarray(log_1_min_ct, dtype),
        log_cumprod_at=jnp.asarray(log_att, dtype),
        log_cumprod_bt=jnp.asarray(log_btt, dtype),
        log_cumprod_ct=jnp.asarray(log_ctt, dtype),
        log_1_min_cumprod_ct=jnp.asarray(log_1_min_ctt, dtype),
    )


# ---------------------------------------------------------------------------
# log-space primitives. All distributions are (B, L, K) with classes last.
# ---------------------------------------------------------------------------

def log_add_exp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Stable log(exp(a) + exp(b)); tolerates -inf in either argument."""
    m = jnp.maximum(a, b)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    return m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))


def index_to_log_onehot(x: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B, L) int -> (B, L, K) log one-hot with off-class value log(1e-30).

    The reference asserts ``x.max() < num_classes``
    (diffusion_transformer.py:46-47) — an out-of-range id would otherwise
    one-hot to an all-zeros row that log/clip turns into a uniform
    log(1e-30) pseudo-distribution and q_pred/q_posterior silently
    renormalize. Under jit the value is traced, so the guard runs only on
    concrete (eager/test/oracle) inputs — the exact wiring-bug class the
    reference assert catches surfaces there."""
    if not isinstance(x, jax.core.Tracer):
        # reduce on the HOST: even on a concrete array, jnp.max inside a jit
        # trace stages into the jaxpr and int() of the result raises — a
        # concrete x (eager call, or a constant closed over by a jitted fn)
        # is always np-convertible
        mx = int(np.asarray(x).max())
        if mx >= num_classes:
            raise ValueError(
                f"token id {mx} out of range for {num_classes} classes")
    onehot = jax.nn.one_hot(x, num_classes, dtype=jnp.float32)
    return jnp.log(jnp.clip(onehot, min=1e-30))


def log_onehot_to_index(log_x: jnp.ndarray) -> jnp.ndarray:
    """(B, L, K) -> (B, L) argmax over classes."""
    return jnp.argmax(log_x, axis=-1)


def _gather_t(coef: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Per-batch coefficient lookup -> (B, 1, 1) for broadcasting over (B, L, K)."""
    return coef[t][:, None, None]


def q_pred(sched: DiffusionSchedule, log_x_start: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """log q(x_t | x_0) for ``t`` in [-1, T-1]; t=-1 is the identity transition.

    Token classes: ``log_add_exp(log_x + log(att), log(btt))``;
    MASK class:    ``log_add_exp(log_x_mask + log(1-ctt), log(ctt))``.
    """
    T = sched.num_timesteps
    t = (t + (T + 1)) % (T + 1)
    log_cum_at = _gather_t(sched.log_cumprod_at, t)
    log_cum_bt = _gather_t(sched.log_cumprod_bt, t)
    log_cum_ct = _gather_t(sched.log_cumprod_ct, t)
    log_1_min_cum_ct = _gather_t(sched.log_1_min_cumprod_ct, t)

    tok = log_add_exp(log_x_start[..., :-1] + log_cum_at, log_cum_bt)
    msk = log_add_exp(log_x_start[..., -1:] + log_1_min_cum_ct, log_cum_ct)
    return jnp.concatenate([tok, msk], axis=-1)


def q_pred_one_timestep(sched: DiffusionSchedule, log_x_t: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """log q(x_t | x_{t-1}) applied to the distribution at x_t (one forward step)."""
    log_at = _gather_t(sched.log_at, t)
    log_bt = _gather_t(sched.log_bt, t)
    log_ct = _gather_t(sched.log_ct, t)
    log_1_min_ct = _gather_t(sched.log_1_min_ct, t)

    tok = log_add_exp(log_x_t[..., :-1] + log_at, log_bt)
    msk = log_add_exp(log_x_t[..., -1:] + log_1_min_ct, log_ct)
    return jnp.concatenate([tok, msk], axis=-1)


def q_posterior(
    sched: DiffusionSchedule,
    log_x_start: jnp.ndarray,
    log_x_t: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """log p(x_{t-1} | x_t) given a (possibly soft) x0 prediction.

    Implements the mask-aware factorization (diffusion_transformer.py:293-339):
      log q(x_{t-1}|x_t, x0) ∝ log p(x0|x_t) + log q(x_t|x_{t-1}) + log q(x_{t-1}|x0)
                               - log q(x_t|x0)
    where positions currently equal to MASK get the closed-form ``ctt`` column.
    ``log_x_t`` must be a log one-hot. Output clamped to [-70, 0].
    """
    num_classes = log_x_start.shape[-1]
    x_t_idx = log_onehot_to_index(log_x_t)
    is_mask = (x_t_idx == num_classes - 1)[..., None]          # (B, L, 1)

    log_cum_ct = _gather_t(sched.log_cumprod_ct, t)            # (B, 1, 1)
    log_ct = _gather_t(sched.log_ct, t)

    # log q(x_t | x0 = k) evaluated at the observed x_t, as a function of k.
    log_qt = q_pred(sched, log_x_t, t)
    log_qt = jnp.concatenate(
        [log_qt[..., :-1], jnp.full_like(log_qt[..., -1:], LOG_EPS)], axis=-1
    )
    ct_cumprod_col = jnp.concatenate(
        [jnp.broadcast_to(log_cum_ct, log_qt[..., :-1].shape),
         jnp.zeros_like(log_qt[..., -1:])],
        axis=-1,
    )
    log_qt = jnp.where(is_mask, ct_cumprod_col, log_qt)

    # log q(x_t | x_{t-1} = k) evaluated at the observed x_t.
    log_qt1 = q_pred_one_timestep(sched, log_x_t, t)
    log_qt1 = jnp.concatenate(
        [log_qt1[..., :-1], jnp.full_like(log_qt1[..., -1:], LOG_EPS)], axis=-1
    )
    ct_col = jnp.concatenate(
        [jnp.broadcast_to(log_ct, log_qt1[..., :-1].shape),
         jnp.zeros_like(log_qt1[..., -1:])],
        axis=-1,
    )
    log_qt1 = jnp.where(is_mask, ct_col, log_qt1)

    q = log_x_start - log_qt
    q_norm = jax.scipy.special.logsumexp(q, axis=-1, keepdims=True)
    q = q - q_norm
    out = q_pred(sched, q, t - 1) + log_qt1 + q_norm
    return jnp.clip(out, MIN_LOGP, 0.0)


def log_sample_categorical(key: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    """Gumbel-argmax sample from per-position log-probs; returns a log one-hot."""
    gumbel = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    sample = jnp.argmax(gumbel + logits, axis=-1)
    return index_to_log_onehot(sample, logits.shape[-1])


def q_sample(
    sched: DiffusionSchedule, key: jax.Array, log_x_start: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Sample x_t ~ q(x_t | x_0) as a log one-hot (forward corruption)."""
    return log_sample_categorical(key, q_pred(sched, log_x_start, t))


def multinomial_kl(log_prob1: jnp.ndarray, log_prob2: jnp.ndarray) -> jnp.ndarray:
    """KL(p1 || p2) per position: (B, L, K) -> (B, L)."""
    return jnp.sum(jnp.exp(log_prob1) * (log_prob1 - log_prob2), axis=-1)


def log_categorical(log_x_start: jnp.ndarray, log_prob: jnp.ndarray) -> jnp.ndarray:
    """E_{x0}[log p(x0)] per position (decoder NLL numerator): (B, L, K) -> (B, L)."""
    return jnp.sum(jnp.exp(log_x_start) * log_prob, axis=-1)

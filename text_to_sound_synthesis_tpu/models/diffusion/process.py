"""DiscreteDiffusion: the VQ-Diffusion process around the denoiser backbone.

Parity target: ``DiffusionTransformer``
(``Diffsound/sound_synthesis/modeling/transformers/diffusion_transformer.py:153-812``):
x0-parameterized reverse process, VLB loss with decoder-NLL at t=0, auxiliary
x0-KL with adaptive (t/T + 1) weight, importance-sampled timesteps, mask/uniform
corruption, and the 100-step reverse sampler (plus the strided ``sample_fast``).

TPU-native redesign:
* the whole reverse sampler is ONE jitted ``lax.scan`` over a precomputed
  timestep vector — the reference runs a 100-iteration Python loop with a fresh
  CUDA launch per op (call stack §3.2 of SURVEY.md).
* truncation filtering is an explicit pure function passed into the scan
  (vs. the reference's permanent monkey-patch of ``predict_start``).
* importance-sampling state (Lt_history/Lt_count) is an explicit pytree carried
  in the train state, updated functionally (vs. registered buffers + in-place
  ``scatter_``).
* all algebra in float32 log-space (see ops/diffusion.py; reference uses f64).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import diffusion as dd
from ...utils.config import instantiate_from_config, register
from .backbone import Text2SpecTransformer

__all__ = [
    "DiscreteDiffusion",
    "DiffusionLossOutput",
    "TimestepSamplerState",
    "sample_timesteps",
    "update_timestep_state",
    "sample_tokens",
    "sample_tokens_fused",
    "sample_tokens_fused_sharded",
]


class DiffusionLossOutput(NamedTuple):
    loss: jnp.ndarray            # scalar: vb_loss.sum() / (B * L)
    kl_loss: jnp.ndarray         # (B,) per-sample kl (or decoder nll at t=0)
    t: jnp.ndarray               # (B,) sampled timesteps
    acc_x0: jnp.ndarray          # (B,) fraction of positions where argmax x0_recon == x0
    acc_keep: jnp.ndarray        # (B,) fraction where posterior argmax == x_t
    log_model_prob: jnp.ndarray  # (B, L, K)


class TimestepSamplerState(NamedTuple):
    """Importance-sampling buffers (diffusion_transformer.py:233-234, 379-406)."""

    Lt_history: jnp.ndarray  # (T,) EMA of squared kl per timestep
    Lt_count: jnp.ndarray    # (T,) visit counts

    @classmethod
    def create(cls, num_timesteps: int) -> "TimestepSamplerState":
        return cls(jnp.zeros((num_timesteps,)), jnp.zeros((num_timesteps,)))


def sample_timesteps(
    key: jax.Array, state: TimestepSamplerState, batch: int, num_timesteps: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample t with uniform fallback until every bucket has >10 visits."""
    k_imp, k_unif = jax.random.split(key)
    use_importance = jnp.all(state.Lt_count > 10)

    lt_sqrt = jnp.sqrt(state.Lt_history + 1e-10) + 1e-4
    lt_sqrt = lt_sqrt.at[0].set(lt_sqrt[1])  # overwrite decoder term with L1
    pt_all = lt_sqrt / jnp.sum(lt_sqrt)
    t_imp = jax.random.categorical(k_imp, jnp.log(pt_all), shape=(batch,))
    pt_imp = pt_all[t_imp]

    t_unif = jax.random.randint(k_unif, (batch,), 0, num_timesteps)
    pt_unif = jnp.full((batch,), 1.0 / num_timesteps)

    t = jnp.where(use_importance, t_imp, t_unif)
    pt = jnp.where(use_importance, pt_imp, pt_unif)
    return t, pt


def update_timestep_state(
    state: TimestepSamplerState, t: jnp.ndarray, kl_loss: jnp.ndarray
) -> TimestepSamplerState:
    """EMA(0.9) the squared loss into Lt_history and bump counts at ``t``."""
    Lt2 = jax.lax.stop_gradient(kl_loss) ** 2
    prev = state.Lt_history[t]
    hist = state.Lt_history.at[t].set(0.1 * Lt2 + 0.9 * prev)
    count = state.Lt_count.at[t].add(1.0)
    return TimestepSamplerState(hist, count)


@register(
    "text_to_sound_synthesis_tpu.models.diffusion.DiscreteDiffusion",
    "sound_synthesis.modeling.transformers.diffusion_transformer.DiffusionTransformer",
)
class DiscreteDiffusion(nn.Module):
    """Backbone + schedule + losses. The condition embedding (frozen CLIP text
    tower) is external: callers pass ``cond_emb`` (B, S, D) directly."""

    transformer_config: Optional[Mapping[str, Any]] = None
    condition_emb_config: Optional[Mapping[str, Any]] = None  # kept for config parity
    content_emb_config: Optional[Mapping[str, Any]] = None
    diffusion_step: int = 100
    alpha_init_type: str = "alpha1"
    auxiliary_loss_weight: float = 5.0e-4
    adaptive_auxiliary_loss: bool = True
    mask_weight: Tuple[float, float] = (1.0, 1.0)
    schedule_kind: str = "mask_and_uniform"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        tcfg = dict((self.transformer_config or {}).get("params", {}))
        tcfg.pop("checkpoint", None)
        emb_cfg = self.content_emb_config or tcfg.pop("content_emb_config", None)
        tcfg.pop("condition_seq_len", None)
        tcfg.pop("diffusion_step", None)  # owned by this module (reference injects it too)
        self.backbone = Text2SpecTransformer(
            diffusion_step=self.diffusion_step, content_emb_config=emb_cfg,
            dtype=self.dtype, name="backbone",
            **{k: v for k, v in tcfg.items() if k in Text2SpecTransformer.__dataclass_fields__},
        )

    # NOTE: these are derived from configs (not from the bound backbone) so they
    # are usable OUTSIDE init/apply — e.g. by the standalone sampler.
    def _emb_params(self) -> dict:
        cfg = self.content_emb_config or (self.transformer_config or {}).get(
            "params", {}
        ).get("content_emb_config")
        return dict((cfg or {}).get("params", {}))

    @property
    def num_classes(self) -> int:
        return int(self._emb_params().get("num_embed", 256)) + 1

    @property
    def content_seq_len(self) -> int:
        return int((self.transformer_config or {}).get("params", {}).get("content_seq_len", 265))

    def schedule(self) -> dd.DiffusionSchedule:
        if self.alpha_init_type != "alpha1":
            raise ValueError(f"unsupported alpha_init_type {self.alpha_init_type!r}")
        return dd.make_schedule(self.diffusion_step, self.num_classes, self.schedule_kind)

    # -- p(x0 | x_t) ---------------------------------------------------------

    def ada_tables(self):
        """Hoistable AdaLN tables (see backbone.ada_tables)."""
        return self.backbone.ada_tables()

    def cond_kvs(self, cond_emb):
        """Hoistable cross-attention K/V (see backbone.cond_kvs)."""
        return self.backbone.cond_kvs(cond_emb)

    def predict_start(self, tokens: jnp.ndarray, cond_emb: jnp.ndarray, t: jnp.ndarray,
                      *, mods=None, cond_kvs=None, deterministic: bool = True) -> jnp.ndarray:
        """token ids (B, L) -> log p(x0 | x_t) over K classes (B, L, K).

        log_softmax over the K-1 real classes (stable f32; reference does f64,
        diffusion_transformer.py:285), MASK column pinned at -70, clamp [-70, 0].
        """
        logits = self.backbone(tokens, cond_emb, t, mods=mods, cond_kvs=cond_kvs,
                               deterministic=deterministic)
        log_pred = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        mask_col = jnp.full(log_pred.shape[:-1] + (1,), dd.MIN_LOGP, log_pred.dtype)
        log_pred = jnp.concatenate([log_pred, mask_col], axis=-1)
        return jnp.clip(log_pred, dd.MIN_LOGP, 0.0)

    def __call__(self, tokens, cond_emb, t, *, deterministic: bool = True):
        """Convenience forward = predict_start (used for init/jit warmup)."""
        return self.predict_start(tokens, cond_emb, t, deterministic=deterministic)

    def backbone_logits(self, tokens, cond_emb, t, *, mods=None, cond_kvs=None,
                        deterministic: bool = True):
        """Raw denoiser logits (B, L, K-1) — conversion-parity + sampler hook."""
        return self.backbone(tokens, cond_emb, t, mods=mods, cond_kvs=cond_kvs,
                             deterministic=deterministic)

    # -- training loss -------------------------------------------------------

    def train_loss(
        self,
        key: jax.Array,
        x0: jnp.ndarray,            # (B, L) int token ids
        cond_emb: jnp.ndarray,      # (B, S, D)
        t: jnp.ndarray,             # (B,) sampled timesteps
        pt: jnp.ndarray,            # (B,) their sampling probabilities
        *,
        is_train: bool = True,
    ) -> DiffusionLossOutput:
        """The vb_stochastic loss (diffusion_transformer.py:408-476)."""
        sched = self.schedule()
        K = self.num_classes
        B, L = x0.shape

        log_x_start = dd.index_to_log_onehot(x0, K)
        log_xt = dd.q_sample(sched, key, log_x_start, t)
        xt = dd.log_onehot_to_index(log_xt)

        log_x0_recon = self.predict_start(xt, cond_emb, t, deterministic=not is_train)
        log_model_prob = dd.q_posterior(sched, log_x0_recon, log_xt, t)
        log_true_prob = dd.q_posterior(sched, log_x_start, log_xt, t)

        kl = dd.multinomial_kl(log_true_prob, log_model_prob)          # (B, L)
        mask_region = (xt == K - 1).astype(jnp.float32)
        mw = mask_region * self.mask_weight[0] + (1.0 - mask_region) * self.mask_weight[1]
        kl = jnp.sum(kl * mw, axis=-1)                                  # (B,)

        decoder_nll = -jnp.sum(dd.log_categorical(log_x_start, log_model_prob), axis=-1)

        is_t0 = (t == 0).astype(jnp.float32)
        kl_loss = is_t0 * decoder_nll + (1.0 - is_t0) * kl

        vb_loss = kl_loss / pt
        if self.auxiliary_loss_weight != 0 and is_train:
            kl_aux = dd.multinomial_kl(log_x_start[..., :-1], log_x0_recon[..., :-1])
            kl_aux = jnp.sum(kl_aux * mw, axis=-1)
            kl_aux_loss = is_t0 * decoder_nll + (1.0 - is_t0) * kl_aux
            if self.adaptive_auxiliary_loss:
                addition_loss_weight = t.astype(jnp.float32) / self.diffusion_step + 1.0
            else:
                addition_loss_weight = 1.0
            vb_loss = vb_loss + addition_loss_weight * self.auxiliary_loss_weight * kl_aux_loss / pt

        loss = jnp.sum(vb_loss) / (B * L)

        # accuracy diagnostics (per-timestep EMAs are kept host-side by the solver)
        x0_recon = dd.log_onehot_to_index(log_x0_recon)
        xtm1_recon = dd.log_onehot_to_index(log_model_prob)
        acc_x0 = jnp.mean((x0_recon == x0).astype(jnp.float32), axis=-1)
        acc_keep = jnp.mean((xtm1_recon == xt).astype(jnp.float32), axis=-1)
        return DiffusionLossOutput(loss, kl_loss, t, acc_x0, acc_keep, log_model_prob)


# ---------------------------------------------------------------------------
# Fused reverse sampler
# ---------------------------------------------------------------------------

def _timestep_plan(num_timesteps: int, start_step: int, skip_step: int):
    """Static (ts, t_post) vectors for the scan.

    Full sampling: ts = [start-1 .. 0], posterior at ts.
    Fast sampling (diffusion_transformer.py:748-812): stride 1+skip with a final
    forced 0; posterior jumps to t - skip while t > skip, else t.
    """
    if skip_step == 0:
        ts = list(range(start_step - 1, -1, -1))
        t_post = ts
    else:
        ts = list(range(start_step - 1, -1, -(1 + skip_step)))
        if ts[-1] != 0:
            ts.append(0)
        t_post = [t - skip_step if t > skip_step else t for t in ts]
    return jnp.asarray(ts, jnp.int32), jnp.asarray(t_post, jnp.int32)


def sample_tokens(
    model: DiscreteDiffusion,
    params,
    key: jax.Array,
    cond_emb: jnp.ndarray,
    *,
    content_tokens: Optional[jnp.ndarray] = None,
    filter_ratio: float = 0.0,
    skip_step: int = 0,
    filter_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    resample_q: float = 0.0,
    return_logits: bool = False,
    uniform_start: bool = False,
):
    """Reverse diffusion as one ``lax.scan``; jit-compatible end to end.

    ``filter_ratio`` > 0 starts from a q_sample corruption of ``content_tokens``
    at t = filter_ratio*T - 1 (the reference ``sample``'s partial mode,
    diffusion_transformer.py:643-651); 0 starts from all-MASK.
    ``uniform_start`` starts from uniformly random tokens instead — the
    reference's ``sample_uniform_only`` (diffusion_transformer.py:661-744),
    the correct x_T when the schedule has no mask mass (``uniform_only``).
    Its randint upper bound num_classes-2 (exclusive, ``:704``) — i.e. the
    last non-MASK class is never drawn — is reproduced as-is.
    ``filter_fn`` is the truncation filter applied to log p(x0|x_t)
    (e.g. ``partial(truncate_top_r, r=0.85)``).
    """
    sched = model.schedule()
    K = model.num_classes
    T = model.diffusion_step
    L = model.content_seq_len
    B = cond_emb.shape[0]

    start_step = int(T * filter_ratio)
    if start_step == 0:
        if uniform_start:
            key, k_init = jax.random.split(key)
            x_init = jax.random.randint(k_init, (B, L), 0, K - 2)
            log_z = dd.index_to_log_onehot(x_init, K)
        else:
            # all-MASK start: log one-hot concentrated on the MASK class
            log_z = jnp.full((B, L, K), -jnp.inf, jnp.float32).at[..., -1].set(0.0)
        plan_start = T
    else:
        if content_tokens is None:
            raise ValueError("filter_ratio > 0 requires content_tokens")
        key, k0 = jax.random.split(key)
        t0 = jnp.full((B,), start_step - 1, jnp.int32)
        log_z = dd.q_sample(sched, k0, dd.index_to_log_onehot(content_tokens, K), t0)
        plan_start = start_step

    ts, t_post = _timestep_plan(T, plan_start, skip_step)

    def p_sample(log_z, t_vec, tp_vec, k_samp):
        xt = dd.log_onehot_to_index(log_z)
        log_x_recon = model.apply(params, xt, cond_emb, t_vec, method=model.predict_start)
        if filter_fn is not None:
            log_x_recon = filter_fn(log_x_recon)
        log_model_prob = dd.q_posterior(sched, log_x_recon, log_z, tp_vec)
        return dd.log_sample_categorical(k_samp, log_model_prob)

    def step(carry, inputs):
        log_z, key = carry
        t_scalar, t_post_scalar = inputs
        key, k_samp, k_q, k_samp2 = jax.random.split(key, 4)
        t_vec = jnp.full((B,), t_scalar, jnp.int32)
        tp_vec = jnp.full((B,), t_post_scalar, jnp.int32)
        log_z = p_sample(log_z, t_vec, tp_vec, k_samp)
        if resample_q > 0.0:
            # the reference's 'q<rate>' wrapper re-applies p_sample to its own
            # output with probability q (dalle_spec.py:135-143)
            log_z = jax.lax.cond(
                jax.random.uniform(k_q) < resample_q,
                lambda z: p_sample(z, t_vec, tp_vec, k_samp2),
                lambda z: z,
                log_z,
            )
        return (log_z, key), None

    (log_z, _), _ = jax.lax.scan(step, (log_z, key), (ts, t_post))
    tokens = dd.log_onehot_to_index(log_z)
    if return_logits:
        return tokens, jnp.exp(log_z)
    return tokens


def sample_tokens_fused(
    model: DiscreteDiffusion,
    params,
    key: jax.Array,
    cond_emb: jnp.ndarray,
    *,
    truncation_r: float = 0.0,
    skip_step: int = 0,
    content_tokens: Optional[jnp.ndarray] = None,
    filter_ratio: float = 0.0,
    use_kernel: Optional[bool] = None,
):
    """Index-carrying reverse sampler: one ``lax.scan`` whose non-transformer
    work is the fused Pallas step (ops/fused_sampler.py) — or its jnp twin on
    non-TPU backends. Same semantics as ``sample_tokens`` with a top-r filter,
    but the carry is (B, L) int32 instead of a (B, L, K) one-hot and the
    posterior/truncation/Gumbel chain runs as a single kernel.
    """
    from ...ops import fused_sampler as fs

    sched = model.schedule()
    K = model.num_classes
    T = model.diffusion_step
    L = model.content_seq_len
    B = cond_emb.shape[0]
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"

    start_step = int(T * filter_ratio)
    if start_step == 0:
        tokens = jnp.full((B, L), K - 1, jnp.int32)  # all-MASK
        plan_start = T
    else:
        if content_tokens is None:
            raise ValueError("filter_ratio > 0 requires content_tokens")
        key, k0 = jax.random.split(key)
        t0 = jnp.full((B,), start_step - 1, jnp.int32)
        log_z = dd.q_sample(sched, k0, dd.index_to_log_onehot(content_tokens, K), t0)
        tokens = dd.log_onehot_to_index(log_z).astype(jnp.int32)
        plan_start = start_step

    ts, t_post = _timestep_plan(T, plan_start, skip_step)
    seed_base = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)

    # hoist step-invariant work out of the scan: AdaLN modulation tables for
    # every t, and the cross-attention K/V of the fixed condition
    tables = model.apply(params, method=model.ada_tables)
    kvs = model.apply(params, cond_emb, method=model.cond_kvs)

    def step(carry, inputs):
        tokens, key = carry
        (t_scalar, t_post_scalar), idx = inputs
        t_vec = jnp.full((B,), t_scalar, jnp.int32)
        mods = [(tab1[t_scalar][None], tab2[t_scalar][None])
                for tab1, tab2 in tables]
        logits = model.apply(params, tokens, cond_emb, t_vec, mods=mods,
                             cond_kvs=kvs, method=model.backbone_logits)
        coeffs = fs.step_coeffs(sched, t_post_scalar)
        if use_kernel:
            tokens = fs.fused_p_sample(logits, tokens, coeffs,
                                       seed_base + idx, truncation_r=truncation_r)
        else:
            key, k = jax.random.split(key)
            tokens = fs.p_sample_from_indices(logits, tokens, coeffs, k,
                                              truncation_r=truncation_r)
        return (tokens, key), None

    idxs = jnp.arange(ts.shape[0], dtype=jnp.int32)
    (tokens, _), _ = jax.lax.scan(step, (tokens, key), ((ts, t_post), idxs))
    return tokens


def sample_tokens_fused_sharded(
    mesh,
    model: DiscreteDiffusion,
    params,
    key: jax.Array,
    cond_emb: jnp.ndarray,          # (B, S, Dc); B % mesh data size == 0
    *,
    axis: str = "data",
    truncation_r: float = 0.0,
    skip_step: int = 0,
    use_kernel: Optional[bool] = None,
):
    """Data-parallel bf16/f32 generation over a ``jax.sharding.Mesh``.

    The shard_map twin of ``int8_runtime.sample_tokens_int8_sharded`` for the
    full-precision fused sampler (BASELINE config 5: fast sampler,
    data-parallel over ICI). Generation is embarrassingly batch-parallel —
    each device runs the full sampler on its batch shard, no collectives.
    Per-shard PRNG folds the device's position along ``axis`` into the global
    key, so the result equals running ``sample_tokens_fused`` per shard with
    ``fold_in(key, i)`` (pinned by tests/test_parallel_generation.py).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    B = cond_emb.shape[0]
    if B % n:
        raise ValueError(
            f"batch {B} must be a multiple of the '{axis}' axis size {n}")

    def shard_fn(key, cond_shard):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return sample_tokens_fused(model, params, key, cond_shard,
                                   truncation_r=truncation_r,
                                   skip_step=skip_step, use_kernel=use_kernel)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(axis)), out_specs=P(axis),
                   check_rep=False)
    return fn(key, cond_emb)

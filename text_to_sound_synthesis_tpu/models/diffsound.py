"""Diffsound composite: frozen spec codec + text codec + diffusion generator.

Parity target: ``DALLE`` (``Diffsound/sound_synthesis/modeling/models/dalle_spec.py:23-351``)
— ``prepare_input`` (spec -> permuted VQ tokens; text -> CLIP BPE ids),
``forward`` (diffusion loss), ``generate_content`` (text -> mel with truncation
sampling), ``reconstruct``, ``decode_to_img``.

TPU-native redesign: instead of one nn.Module owning frozen submodules (the
reference needs DDP ``find_unused_parameters=True`` because of this), the
composite is a plain object holding three separately-parameterized flax models:

* ``codec``   — VQModel (frozen; params never enter the optimizer)
* ``cond``    — CLIPTextEmbedding (frozen)
* ``diffusion`` — DiscreteDiffusion (trained)

Every compute path is a pure jittable function over an explicit params pytree;
text tokenization is the only host-side step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Mapping, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import permuter as permuter_ops
from ..ops.sampling import truncate_top_k, truncate_top_r
from ..utils.config import instantiate_from_config, register
from .clip.text_model import CLIPTextEmbedding
from .clip.tokenize import Tokenize
from .diffusion.process import DiscreteDiffusion, sample_tokens, sample_tokens_fused
from .vqgan.model import VQModel

__all__ = ["Diffsound", "build_model", "parse_sample_type"]


def parse_sample_type(sample_type: str):
    """'top0.85r[,fastN]' -> (filter_fn, skip_step) — the reference's string
    protocol (generate_samples_batch.py:143, dalle_spec.py:205-223)."""
    parts = sample_type.split(",") if sample_type else [""]
    head = parts[0]
    filter_fn = None
    if head.startswith("top"):
        if head.endswith("r"):
            filter_fn = partial(truncate_top_r, r=float(head[3:-1]))
        elif head.endswith("p"):
            filter_fn = partial(truncate_top_k, k=int(head[3:-1]))
        else:
            raise ValueError(f"bad sample_type head: {head!r}")
    skip_step = 0
    resample_q = 0.0
    for p in parts[1:]:
        if p.startswith("fast"):
            skip_step = int(p[4:])
        elif p.startswith("q"):
            resample_q = float(p[1:])
    return filter_fn, skip_step, resample_q


@register(
    "text_to_sound_synthesis_tpu.models.Diffsound",
    "sound_synthesis.modeling.models.dalle_spec.DALLE",
)
class Diffsound:
    def __init__(
        self,
        *,
        content_codec_config: Mapping[str, Any],
        condition_codec_config: Mapping[str, Any],
        diffusion_config: Mapping[str, Any],
        first_stage_permuter_config: Optional[Mapping[str, Any]] = None,
        content_info: Mapping[str, Any] = {"key": "image"},
        condition_info: Mapping[str, Any] = {"key": "text"},
        dtype=jnp.float32,
    ):
        if isinstance(dtype, str):  # config files say e.g. dtype: bfloat16
            dtype = jnp.dtype(dtype)
        self.dtype = dtype
        self.content_info = dict(content_info)
        self.condition_info = dict(condition_info)
        self.codec: VQModel = instantiate_from_config(
            {**content_codec_config, "params": {**(content_codec_config.get("params") or {}), "dtype": dtype}}
        )
        # trained stage-1 weights for the frozen codec (dalle_spec.py:45-49
        # loads the codebook ckpt named in the config): orbax tree from
        # tools/train_vqgan.py (or a converted torch .ckpt) applied in
        # init_params. Empty/missing -> random init (bring-up mode).
        self.codec_ckpt_path = (content_codec_config.get("params") or {}).get(
            "ckpt_path")
        self.text_codec: Tokenize = instantiate_from_config(condition_codec_config)

        dcfg = dict(diffusion_config.get("params") or {})
        cond_cfg = dcfg.pop("condition_emb_config", None)
        self.cond: Optional[CLIPTextEmbedding] = (
            instantiate_from_config(
                {**cond_cfg, "params": {**(cond_cfg.get("params") or {}), "dtype": dtype}}
            )
            if cond_cfg
            else None
        )
        self.diffusion: DiscreteDiffusion = instantiate_from_config(
            {"target": diffusion_config["target"], "params": {**dcfg, "dtype": dtype}}
        )
        if first_stage_permuter_config:
            self.permuter = instantiate_from_config(first_stage_permuter_config)
        else:
            self.permuter = permuter_ops.Identity()

        H, W = self.diffusion._emb_params().get("spatial_size", (5, 53))
        self.token_hw = (int(H), int(W))

    # -- initialization ------------------------------------------------------

    def init_params(self, key: jax.Array, mel_shape=(1, 80, 848, 1),
                    load_codec: bool = True) -> dict:
        """Random init of all three param trees (real runs overwrite codec/cond
        from converted reference checkpoints).

        ``load_codec=False`` skips the ``content_codec_config.params.ckpt_path``
        stage-1 restore — callers that immediately overwrite the whole tree
        from a full checkpoint (tools/generate.py, serve.py, the converter)
        pass False so a stale/absent codec path can't crash them and they
        don't pay a restore whose result is discarded."""
        k1, k2, k3 = jax.random.split(key, 3)
        codec_params = self.codec.init(k1, jnp.zeros(mel_shape))
        ctx = self.cond.context_length if self.cond else 77
        cond_dim = self.cond.width if self.cond else 512
        cond_params = (
            self.cond.init(k2, jnp.zeros((1, ctx), jnp.int32)) if self.cond else None
        )
        L = self.diffusion.content_seq_len
        diff_params = self.diffusion.init(
            k3, jnp.zeros((1, L), jnp.int32), jnp.zeros((1, ctx, cond_dim)), jnp.zeros((1,), jnp.int32)
        )
        if load_codec and self.codec_ckpt_path:
            codec_params = self._load_codec_params(codec_params)
        return {"codec": codec_params, "cond": cond_params, "diffusion": diff_params}

    def _load_codec_params(self, template):
        """Replace the random codec init with the trained stage-1 weights at
        ``content_codec_config.params.ckpt_path``: a torch .ckpt (converted),
        a tools/train_vqgan.py checkpoint dir ({'state': VQGANTrainState}),
        or a bare orbax VQModel param tree."""
        path = self.codec_ckpt_path
        if str(path).endswith((".ckpt", ".pth", ".pt")):
            from ..convert.torch_to_jax import convert_vqgan, load_torch_state_dict

            return convert_vqgan(load_torch_state_dict(path), template)
        import os as _os

        import orbax.checkpoint as ocp

        raw = ocp.PyTreeCheckpointer().restore(_os.path.abspath(path))
        if isinstance(raw, dict) and "state" in raw and isinstance(
                raw["state"], dict) and "ae_params" in raw["state"]:
            raw = raw["state"]["ae_params"]   # train_vqgan 'last' layout
        if not (isinstance(raw, dict) and "params" in raw):
            raise ValueError(
                f"unrecognized codec checkpoint layout at {path!r}")
        # structural check against the template, then adopt the trained tree
        jax.tree_util.tree_map(lambda a, b: None, template, raw)
        return jax.tree_util.tree_map(jnp.asarray, raw)

    # -- tokenization paths (prepare_input equivalents) ----------------------

    def text_to_tokens(self, texts: Sequence[str]) -> dict:
        """Host-side BPE: captions -> {'token': (B,77) int32, 'mask': ...}."""
        return self.text_codec.get_tokens(texts)

    def encode_content(self, params, mel: jnp.ndarray) -> jnp.ndarray:
        """mel (B, H, W, 1) in [-1,1] -> (B, L) permuted token ids
        (DALLE.get_tokens, dalle_spec.py:71-78)."""
        indices = self.codec.apply(params["codec"], mel, method=self.codec.encode_indices)
        flat = indices.reshape(indices.shape[0], -1)
        return self.permuter(flat)

    def decode_tokens(self, params, tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, L) permuted token ids -> mel (B, H, W, 1) in [-1,1]
        (DALLE.decode_to_img, dalle_spec.py:80-91)."""
        H, W = self.token_hw
        grid = self.permuter(tokens, reverse=True).reshape(-1, H, W)
        return self.codec.apply(params["codec"], grid, method=self.codec.decode_code)

    def embed_condition(self, params, cond_tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, 77) BPE ids -> frozen CLIP features (B, 77, 512)."""
        return self.cond.apply(params["cond"], cond_tokens)

    # -- training ------------------------------------------------------------

    def loss(self, params, key, mel, cond_tokens, t, pt, *, is_train=True):
        """Full training loss: encode content (frozen), embed text (frozen),
        diffusion VLB. Returns DiffusionLossOutput."""
        tokens = jax.lax.stop_gradient(self.encode_content(params, mel))
        cond_emb = jax.lax.stop_gradient(self.embed_condition(params, cond_tokens))
        return self.diffusion.apply(
            params["diffusion"], key, tokens, cond_emb, t, pt,
            is_train=is_train, method=self.diffusion.train_loss,
            rngs={"dropout": key} if is_train else None,
        )

    # -- inference -----------------------------------------------------------

    def generate(
        self,
        params,
        key: jax.Array,
        cond_tokens: jnp.ndarray,
        *,
        sample_type: str = "top0.85r",
        filter_ratio: float = 0.0,
        content_tokens: Optional[jnp.ndarray] = None,
        return_tokens: bool = False,
        use_fused: Optional[bool] = None,
    ):
        """text tokens -> mel (B, H, W, 1) in [-1, 1]. Jittable (static
        sample_type/filter_ratio). DALLE.generate_content equivalent.

        ``use_fused`` (default: auto on TPU) routes top-r sampling through the
        index-carrying fused Pallas step — same distribution, different RNG
        stream than the one-hot path.
        """
        filter_fn, skip_step, resample_q = parse_sample_type(sample_type)
        head = sample_type.split(",")[0]
        fused_ok = (resample_q == 0.0) and (filter_fn is None or head.endswith("r"))
        if use_fused is None:
            use_fused = fused_ok and jax.default_backend() == "tpu"
        cond_emb = self.embed_condition(params, cond_tokens)
        if use_fused and fused_ok:
            r = float(head[3:-1]) if head.startswith("top") else 0.0
            tokens = sample_tokens_fused(
                self.diffusion, params["diffusion"], key, cond_emb,
                truncation_r=r, skip_step=skip_step,
                content_tokens=content_tokens, filter_ratio=filter_ratio,
            )
        else:
            tokens = sample_tokens(
                self.diffusion, params["diffusion"], key, cond_emb,
                content_tokens=content_tokens, filter_ratio=filter_ratio,
                skip_step=skip_step, filter_fn=filter_fn, resample_q=resample_q,
            )
        mel = self.decode_tokens(params, tokens)
        if return_tokens:
            return mel, tokens
        return mel

    def reconstruct(self, params, mel: jnp.ndarray) -> jnp.ndarray:
        """Codec round-trip (DALLE.reconstruct, dalle_spec.py:249-261)."""
        return self.decode_tokens(params, self.encode_content(params, mel))

    # -- int8 serving mode ----------------------------------------------------

    def quantize_for_serving(self, params, *, weight_bits: int = 8):
        """Denoiser params -> int8 serving engine (models/diffusion/int8_runtime).

        ``weight_bits=4`` stores the dense weights nibble-packed (W4A8) —
        halves the per-step HBM weight stream, measured faster in context on
        v5e (docs/ROOFLINE.md round 5). One-time cost; the returned engine is
        a pytree usable under jit. The codec/cond trees are unchanged (they
        are a tiny share of the FLOPs).
        """
        from .diffusion.int8_runtime import quantize_denoiser

        tcfg = (self.diffusion.transformer_config or {}).get("params", {})
        return quantize_denoiser(
            params["diffusion"],
            n_head=int(tcfg.get("n_head", 16)),
            seq_len=self.diffusion.content_seq_len,
            num_timesteps=self.diffusion.diffusion_step,
            weight_bits=weight_bits,
        )

    def calibrate_serving_engine(
        self,
        params,
        qp,
        key: jax.Array,
        cond_tokens: jnp.ndarray,
        *,
        sample_type: str = "top0.85r",
        margin: float = 1.0,
    ):
        """Static-quantization calibration pass: run the dynamic int8 sampler
        on ``cond_tokens`` (representative captions), record per-site
        activation maxima, and return the engine with calibrated static
        scales baked in (``act_scales``) — the abs-max-free serving mode
        (models/diffusion/calibrate.py). Top-r sampling only, mirroring
        ``generate_int8``.
        """
        from .diffusion.calibrate import calibrate_act_scales

        head = sample_type.split(",")[0]
        if not (head.startswith("top") and head.endswith("r")):
            raise ValueError(
                f"int8 serving supports top-r truncation sampling, got {sample_type!r}")
        r = float(head[3:-1])
        _, skip_step, resample_q = parse_sample_type(sample_type)
        if resample_q:
            raise ValueError("int8 serving does not support q-resample wrappers")
        cond_emb = self.embed_condition(params, cond_tokens)
        # the calibration pass runs the stacked-jnp path, which needs plain
        # int8 values; for a W4 engine run it on the bit-identical unpacked
        # twin and bake the scales into the packed engine
        from .diffusion.int8_runtime import unpack_denoiser

        scales = calibrate_act_scales(
            unpack_denoiser(qp), self.diffusion.schedule(), key, cond_emb,
            truncation_r=r, skip_step=skip_step, margin=margin,
        )
        return qp.replace(act_scales=scales)

    def generate_int8(
        self,
        params,
        qp,
        key: jax.Array,
        cond_tokens: jnp.ndarray,
        *,
        sample_type: str = "top0.85r",
        impl: Optional[str] = None,
    ):
        """``generate`` on the int8 serving engine (top-r sampling only).

        ``params`` supplies the full-precision codec/cond trees; ``qp`` is the
        engine from ``quantize_for_serving``. ``impl`` picks the transformer
        path (default: pallas block kernels on TPU, xla elsewhere).
        """
        from .diffusion.int8_runtime import sample_tokens_int8

        head = sample_type.split(",")[0]
        if not (head.startswith("top") and head.endswith("r")):
            raise ValueError(
                f"int8 serving supports top-r truncation sampling, got {sample_type!r}")
        r = float(head[3:-1])
        _, skip_step, resample_q = parse_sample_type(sample_type)
        if resample_q:
            raise ValueError("int8 serving does not support q-resample wrappers")
        cond_emb = self.embed_condition(params, cond_tokens)
        tokens = sample_tokens_int8(
            qp, self.diffusion.schedule(), key, cond_emb,
            truncation_r=r, skip_step=skip_step, impl=impl,
        )
        return self.decode_tokens(params, tokens)

    @property
    def time_downsample(self) -> int:
        """Codec temporal downsampling factor (16 for ch_mult [1,1,2,2,4])."""
        return 2 ** (len(self.codec.ddconfig["ch_mult"]) - 1)

    def generate_long(
        self,
        params,
        key: jax.Array,
        cond_tokens: jnp.ndarray,
        *,
        duration_frames: int,
        overlap_frames: int = 160,
        sample_type: str = "top0.85r",
        use_fused: Optional[bool] = None,
        qp=None,
        impl: Optional[str] = None,
    ) -> jnp.ndarray:
        """Long-form generation beyond the 10 s training window.

        The reference caps clips at the transformer's 265-token grid (its
        permuter hints at "infinite" sampling, permuter.py:31-49, but the
        Diffsound path never uses it). Here: generate ``ceil`` overlapping
        full-length segments for the same caption in ONE batched sampler call
        (segments are just extra batch rows — ideal for the TPU MXU), decode,
        and linearly cross-fade the overlaps in the mel domain (the codec is
        fully convolutional in time, so segment edges are locally coherent).

        ``duration_frames``: target mel frames (e.g. 2120 for ~25 s).
        Returns (B, n_mels, duration_frames, 1) in [-1, 1]. Jittable for a
        fixed ``duration_frames``. Passing ``qp`` (the engine from
        ``quantize_for_serving``) runs the segments through the int8 serving
        path (``generate_int8``; top-r sampling only) instead of bf16.
        """
        import math

        if qp is not None:
            def _gen(p, k, c):
                return self.generate_int8(p, qp, k, c, sample_type=sample_type,
                                          impl=impl)
        else:
            def _gen(p, k, c):
                return self.generate(p, k, c, sample_type=sample_type,
                                     use_fused=use_fused)

        B = cond_tokens.shape[0]
        seg = self.time_downsample * self.token_hw[1]
        if overlap_frames <= 0 or overlap_frames >= seg:
            raise ValueError(f"overlap_frames must be in (0, {seg})")
        if duration_frames <= seg:
            mel = _gen(params, key, cond_tokens)
            return mel[:, :, :duration_frames]
        hop = seg - overlap_frames
        n = math.ceil((duration_frames - seg) / hop) + 1
        total = hop * (n - 1) + seg

        cond_rep = jnp.repeat(cond_tokens, n, axis=0)
        mels = _gen(params, key, cond_rep)
        n_mels = mels.shape[1]
        mels = mels.reshape(B, n, n_mels, seg, 1)

        ramp = (jnp.arange(1, overlap_frames + 1, dtype=mels.dtype)
                / (overlap_frames + 1))
        up = jnp.concatenate([ramp, jnp.ones((seg - overlap_frames,), mels.dtype)])
        down = up[::-1]
        out = jnp.zeros((B, n_mels, total, 1), mels.dtype)
        wsum = jnp.zeros((total,), mels.dtype)
        for i in range(n):  # n is static; unrolled into one fused add chain
            # edge ramps COMPOSE by multiplication (when overlap > seg/2 the
            # two ramp regions overlap mid-segment; .set()-style overwrites
            # produced non-unity summed weights there) and the final division
            # by the accumulated weight makes the blend exact for any overlap
            w = jnp.ones((seg,), mels.dtype)
            if i > 0:
                w = w * up
            if i < n - 1:
                w = w * down
            piece = mels[:, i] * w[None, None, :, None]
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, (0, 0, i * hop, 0),
                                           (B, n_mels, seg, 1)) + piece,
                (0, 0, i * hop, 0))
            wsum = jax.lax.dynamic_update_slice(
                wsum, jax.lax.dynamic_slice(wsum, (i * hop,), (seg,)) + w,
                (i * hop,))
        out = out / wsum[None, None, :, None]
        return out[:, :, :duration_frames]

    def sample_grid(
        self,
        params,
        key: jax.Array,
        mel: jnp.ndarray,
        cond_tokens: jnp.ndarray,
        *,
        filter_ratios: Sequence[float] = (0.0, 0.5, 1.0),
        sample_type: str = "top0.85r",
    ) -> dict:
        """Train-time visualization grid (DALLE.sample, dalle_spec.py:263-338):
        input, codec reconstruction, and generations started from increasingly
        corrupted encodings of the input (filter_ratio 0 = pure text-to-sound)."""
        out = {"input_image": mel,
               "reconstruction_image": self.reconstruct(params, mel)}
        content = self.encode_content(params, mel)
        for fr in filter_ratios:
            key, k = jax.random.split(key)
            out[f"cond1_cont1.0_fr{fr}_image"] = self.generate(
                params, k, cond_tokens, sample_type=sample_type,
                filter_ratio=fr, content_tokens=content if fr > 0 else None,
            )
        return out


def build_model(config: Mapping[str, Any]) -> Diffsound:
    """``build_model(config['model'])`` equivalent of
    ``Diffsound/sound_synthesis/modeling/build.py:4-5``."""
    model_cfg = config.get("model", config)
    return instantiate_from_config(model_cfg)

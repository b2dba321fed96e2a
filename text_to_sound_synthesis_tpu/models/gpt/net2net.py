"""Net2Net AR composite: frozen VQ codec + conditioning stage + GPT.

Parity target: ``Net2NetTransformer``
(``Codebook/specvqgan/models/cond_transformer.py:20-194``): encode spec to
permuted tokens (``encode_to_z``), raw text features pass through the cond
stage (``RawFeatsStage``, ``modules/misc/raw_feats.py:3``), next-token
cross-entropy training, top-k sampling, decode back to mel.

Same composite philosophy as models/diffsound.py: separate frozen/trainable
param trees, pure jittable functions, KV-cached fused sampling.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import optax

from ...ops import permuter as permuter_ops
from ...utils.config import instantiate_from_config, register
from ..vqgan.model import VQModel
from .model import GPTClass, GPTFeats, GPTFeatsClass, ar_sample

__all__ = ["Net2NetTransformer"]


@register(
    "text_to_sound_synthesis_tpu.models.gpt.Net2NetTransformer",
    "specvqgan.models.cond_transformer.Net2NetTransformer",
)
class Net2NetTransformer:
    def __init__(
        self,
        *,
        transformer_config: Mapping[str, Any],
        first_stage_config: Mapping[str, Any],
        cond_stage_config: Optional[Mapping[str, Any]] = None,  # RawFeatsStage: passthrough
        first_stage_permuter_config: Optional[Mapping[str, Any]] = None,
        cond_stage_key: str = "feature",
        first_stage_key: str = "image",
        downsample_cond_size: int = -1,
        pkeep: float = 1.0,
        base_learning_rate: float | None = None,
        dtype=jnp.float32,
    ):
        self.first_stage_key = first_stage_key
        self.cond_stage_key = cond_stage_key
        self.pkeep = float(pkeep)
        self.codec: VQModel = instantiate_from_config(
            {**first_stage_config, "params": {**(first_stage_config.get("params") or {}), "dtype": dtype}}
        )
        tcfg = dict(transformer_config.get("params") or {})
        target = str(transformer_config.get("target", "mingpt.GPTFeats"))
        gpt_cls = (GPTFeatsClass if target.endswith("GPTFeatsClass")
                   else GPTClass if target.endswith("GPTClass")
                   else GPTFeats)
        self.gpt = gpt_cls(dtype=dtype, **tcfg)
        if first_stage_permuter_config:
            self.permuter = instantiate_from_config(first_stage_permuter_config)
        else:
            self.permuter = permuter_ops.Identity()

    # -- init ---------------------------------------------------------------

    def init_params(self, key, mel_shape=(1, 80, 848, 1), cond_shape=(1, 512, 1),
                    cond_example=None):
        """``cond_example`` overrides the zero-feature example for the class /
        feats+class conditioned variants (class ids, {'feature','target'})."""
        k1, k2 = jax.random.split(key)
        codec_params = self.codec.init(k1, jnp.zeros(mel_shape))
        if cond_example is None:
            cond_example = jnp.zeros(cond_shape)
        gpt_params = self.gpt.init(k2, jnp.zeros((1, 1), jnp.int32), cond_example)
        return {"codec": codec_params, "gpt": gpt_params}

    # -- token paths ---------------------------------------------------------

    def encode_to_z(self, params, mel: jnp.ndarray) -> jnp.ndarray:
        idx = self.codec.apply(params["codec"], mel, method=self.codec.encode_indices)
        return self.permuter(idx.reshape(idx.shape[0], -1))

    def decode_to_img(self, params, tokens: jnp.ndarray, hw) -> jnp.ndarray:
        H, W = hw
        grid = self.permuter(tokens, reverse=True).reshape(-1, H, W)
        return self.codec.apply(params["codec"], grid, method=self.codec.decode_code)

    # -- training loss -------------------------------------------------------

    def loss(self, params, mel: jnp.ndarray, cond_feats: jnp.ndarray,
             key=None):
        """Next-token cross entropy (cond_transformer.py:68-116, 353-359):
        targets are the full token sequence; inputs are cond + tokens[:-1].

        ``pkeep < 1``: the reference's token-corruption regularizer — each
        INPUT token is kept with probability pkeep, else replaced by a
        uniform random id (cond_transformer.py forward); targets stay the
        clean sequence. Requires ``key`` when active."""
        z = jax.lax.stop_gradient(self.encode_to_z(params, mel))
        z_in = z[:, :-1]
        if self.pkeep < 1.0:
            if key is None:
                raise ValueError("pkeep < 1 training needs a PRNG key")
            k_mask, k_rand = jax.random.split(key)
            keep = jax.random.bernoulli(k_mask, self.pkeep, z_in.shape)
            rand = jax.random.randint(k_rand, z_in.shape, 0,
                                      self.codec.n_embed)
            z_in = jnp.where(keep, z_in, rand)
        logits = self.gpt.apply(params["gpt"], z_in, cond_feats)
        n_cond = logits.shape[1] - (z.shape[1] - 1)
        logits = logits[:, n_cond - 1 :]  # predictions for z[0..L-1]
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), z
        ).mean()
        return loss, logits

    # -- sampling ------------------------------------------------------------

    def sample(self, params, key, cond_feats: jnp.ndarray, hw, *, steps: Optional[int] = None,
               top_k: int = 100, temperature: float = 1.0) -> jnp.ndarray:
        """cond (B, D, Tc) -> mel (B, H, W, 1); KV-cached scan sampler."""
        H, W = hw
        steps = steps or H * W
        tokens = ar_sample(self.gpt, params["gpt"], key, cond_feats,
                           steps=steps, top_k=top_k, temperature=temperature)
        return self.decode_to_img(params, tokens, hw)

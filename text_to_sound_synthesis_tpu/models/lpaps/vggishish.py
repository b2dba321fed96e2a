"""VGGishish: VGG16-style classifier over mel spectrograms.

Parity targets: ``VGGishish``
(``Codebook/specvqgan/modules/losses/vggishish/model.py:5-60``) and the 5-tap
feature splitter ``vggishish16`` (``lpaps.py:100-143``): conv stack
[64,64,MP,128,128,MP,256x3,MP,512x3,MP,512x3] (no BN for the LPAPS variant),
adaptive-avgpool to (5, 10), 3-layer MLP head over 309 VGGSound classes.
Feature taps after relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from ...utils.config import register

__all__ = ["VGGishish", "VGG16_LAYERS"]

VGG16_LAYERS: Tuple[Union[int, str], ...] = (
    64, 64, "MP", 128, 128, "MP", 256, 256, 256, "MP", 512, 512, 512, "MP",
    512, 512, 512,
)
# conv indices (within the conv-only sequence) after which a slice tap fires:
# relu1_2 -> after conv 1, relu2_2 -> conv 3, relu3_3 -> conv 6,
# relu4_3 -> conv 9, relu5_3 -> conv 12.
_TAP_AFTER_CONV = (1, 3, 6, 9, 12)


def _adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics on NHWC."""
    B, H, W, C = x.shape
    oh, ow = out_hw

    def pool_axis(arr, size, out, axis):
        # torch bins: start = floor(i*size/out), end = ceil((i+1)*size/out)
        import numpy as np

        pieces = []
        for i in range(out):
            s = (i * size) // out
            e = -(-((i + 1) * size) // out)
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(s, e)
            pieces.append(arr[tuple(sl)].mean(axis=axis, keepdims=True))
        return jnp.concatenate(pieces, axis=axis)

    x = pool_axis(x, H, oh, 1)
    x = pool_axis(x, W, ow, 2)
    return x


@register(
    "text_to_sound_synthesis_tpu.models.lpaps.VGGishish",
    "specvqgan.modules.losses.vggishish.model.VGGishish",
)
class VGGishish(nn.Module):
    conv_layers: Sequence = VGG16_LAYERS
    use_bn: bool = False
    num_classes: int = 309
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, return_features: bool = False,
                 train: bool = False):
        """x: (B, H, W) mel (standardized) or (B, H, W, 1).

        ``return_features=True`` -> list of the 5 slice activations (NHWC);
        otherwise class logits (B, num_classes).
        """
        if x.ndim == 3:
            x = x[..., None]
        feats: List[jnp.ndarray] = []
        conv_i = 0
        for v in self.conv_layers:
            if v == "MP":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(int(v), (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv_{conv_i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                 name=f"bn_{conv_i}")(x)
            x = nn.relu(x)
            if conv_i in _TAP_AFTER_CONV:
                feats.append(x)
            conv_i += 1
        if return_features:
            return feats
        x = _adaptive_avg_pool(x, (5, 10))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(4096, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(4096, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc3")(x)

"""Vector quantization — nearest-neighbor codebook lookup on the MXU.

Parity target: ``Codebook/specvqgan/modules/vqvae/quantize.py:5-103``
(expanded-L2 distances, beta-weighted commitment loss, straight-through
estimator, perplexity statistic, ``get_codebook_entry``).

TPU-native notes: the distance computation is a single (B*H*W, C) x (C, K)
matmul (MXU) plus row/column norms — never materializing one-hots; quantized
vectors come from a gather instead of the reference's scatter+matmul.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["VectorQuantizer", "VQResult", "nearest_codebook_indices"]


class VQResult(NamedTuple):
    z_q: jnp.ndarray          # straight-through quantized latents, same shape as z
    loss: jnp.ndarray         # codebook + commitment loss (scalar)
    indices: jnp.ndarray      # (..., ) int32 nearest codebook ids
    perplexity: jnp.ndarray   # scalar codebook-usage perplexity


def nearest_codebook_indices(z_flat: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """argmin_k ||z - e_k||^2 via the expanded form z^2 + e^2 - 2 z.e.

    ``z_flat``: (N, C) float; ``codebook``: (K, C). Returns (N,) int32.
    The z^2 term is constant per row and dropped (argmin-invariant).
    """
    z32 = z_flat.astype(jnp.float32)
    cb32 = codebook.astype(jnp.float32)
    dots = jax.lax.dot_general(
        z32, cb32, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N, K)
    d = jnp.sum(cb32**2, axis=1)[None, :] - 2.0 * dots
    return jnp.argmin(d, axis=1).astype(jnp.int32)


class VectorQuantizer(nn.Module):
    """Codebook of ``n_e`` vectors of dim ``e_dim``; beta-commitment VQ."""

    n_e: int = 256
    e_dim: int = 256
    beta: float = 0.25

    def setup(self):
        self.codebook = self.param(
            "codebook",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_e, maxval=1.0 / self.n_e
            ),
            (self.n_e, self.e_dim),
        )

    def __call__(self, z: jnp.ndarray) -> VQResult:
        """z: (..., e_dim) channels-last (any leading shape)."""
        lead = z.shape[:-1]
        z_flat = z.reshape(-1, self.e_dim)
        idx = nearest_codebook_indices(z_flat, self.codebook)
        z_q = jnp.take(self.codebook, idx, axis=0).reshape(z.shape).astype(z.dtype)

        loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + self.beta * jnp.mean(
            (z_q - jax.lax.stop_gradient(z)) ** 2
        )
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through

        counts = jnp.bincount(idx, length=self.n_e)
        e_mean = counts / idx.shape[0]
        perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
        return VQResult(z_q, loss, idx.reshape(lead), perplexity)

    def get_codebook_entry(self, indices: jnp.ndarray) -> jnp.ndarray:
        """(...,) int ids -> (..., e_dim) codebook vectors (decode-from-tokens)."""
        return jnp.take(self.codebook, indices, axis=0)

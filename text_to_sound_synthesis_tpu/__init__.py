"""text_to_sound_synthesis_tpu — a TPU-native text-to-sound generation framework.

A from-scratch JAX/XLA/Pallas re-design of the two-stage "Diffsound" text-to-sound
system (spectrogram VQ-VAE tokenizer + discrete-diffusion token generator + MelGAN
vocoder), built TPU-first:

* compute path: flax.linen modules traced under ``jax.jit``; NHWC conv layouts;
  bf16-friendly matmuls on the MXU; the 100-step discrete-diffusion sampler is a
  single fused ``lax.scan``.
* scale path: ``jax.sharding.Mesh`` + ``shard_map``/``NamedSharding`` data-parallel
  training with XLA collectives over ICI (no NCCL, no DDP wrappers).
* host path: numpy signal processing, sharded file-based input pipeline, orbax
  checkpoints, and a PyTorch->JAX converter for released reference artifacts.

Reference capability map: see SURVEY.md at the repo root. Reference implementation
(studied, not copied): yangdongchao/Text-to-sound-Synthesis.
"""

__version__ = "0.1.0"

# importing the package registers every config target (models, engine
# schedulers/clip-grad, datasets) so reference YAMLs resolve immediately
from . import data, engine, evaluation, models, ops, utils  # noqa: E402,F401

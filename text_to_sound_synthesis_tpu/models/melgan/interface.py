"""Vocoder interface: load a trained MelGAN and synthesize waveforms.

Parity target: ``Diffsound/vocoder/mel2wav/interface.py:21-99``
(``load_model(root)`` reading ``args.yml`` + ``best_netG.pt``, ``MelVocoder``
wav<->mel helpers). Loads either a converted orbax checkpoint or the released
torch ``best_netG.pt`` directly (weight norm folded on the fly).
"""

from __future__ import annotations

import os


import numpy as np

import jax
import jax.numpy as jnp

from ...ops.signal import wav_to_mel
from .generator import MelGANGenerator

__all__ = ["load_vocoder", "Vocoder"]


def _read_args_yml(root: str) -> dict:
    path = os.path.join(root, "args.yml")
    args = {}
    if os.path.exists(path):
        import yaml

        with open(path) as f:
            try:
                args = dict(yaml.safe_load(f) or {})
            except yaml.YAMLError:
                # reference args.yml may carry python-object tags; fall back to
                # a line parser for the three fields we need
                f.seek(0)
                for line in f:
                    for key in ("n_mel_channels", "ngf", "n_residual_layers"):
                        if line.strip().startswith(key):
                            args[key] = int(line.split(":")[1].strip())
    return args


def load_vocoder(root: str) -> "Vocoder":
    """root contains args.yml + best_netG.pt (torch) or melgan_params (orbax)."""
    args = _read_args_yml(root)
    gen = MelGANGenerator(
        input_size=int(args.get("n_mel_channels", 80)),
        ngf=int(args.get("ngf", 32)),
        n_residual_layers=int(args.get("n_residual_layers", 3)),
    )
    mel0 = jnp.zeros((1, 10, gen.input_size))
    params = gen.init(jax.random.PRNGKey(0), mel0)

    torch_ckpt = os.path.join(root, "best_netG.pt")
    orbax_ckpt = os.path.join(root, "melgan_params")
    if os.path.isdir(orbax_ckpt):
        import orbax.checkpoint as ocp

        params = ocp.PyTreeCheckpointer().restore(orbax_ckpt, item=jax.device_get(params))
        params = jax.tree_util.tree_map(jnp.asarray, params)
    elif os.path.exists(torch_ckpt):
        from ...convert.torch_to_jax import convert_melgan_generator, load_torch_state_dict

        sd = load_torch_state_dict(torch_ckpt)
        params = convert_melgan_generator(sd, params,
                                          n_residual_layers=gen.n_residual_layers)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        raise FileNotFoundError(f"no vocoder checkpoint under {root}")
    return Vocoder(gen, params)


class Vocoder:
    def __init__(self, gen: MelGANGenerator, params):
        self.gen = gen
        self.params = params
        self._jitted = jax.jit(lambda p, m: gen.apply(p, m))

    def __call__(self, spec: jnp.ndarray) -> np.ndarray:
        """(B, 80, T) spec (the [0,1]-normalized training convention) ->
        (B, T*256) waveform in [-1, 1]. The generation pipeline feeds the
        generated [0,1] spec directly (generate_samples_batch.py:185)."""
        wav = self._jitted(self.params, jnp.swapaxes(jnp.asarray(spec), 1, 2))
        return np.asarray(wav)[..., 0]

    def wav2mel(self, wav: np.ndarray) -> np.ndarray:
        """(B, T) -> (B, 80, frames) training-convention [0,1] spec."""
        return np.asarray(wav_to_mel(jnp.asarray(wav)))

"""Native (C++) runtime components, loaded via ctypes.

The compute path is jax/XLA/pallas; these are the host-side runtime pieces
where the reference uses native-backed machinery (torch DataLoader's C++
worker pool, ``build.py:404-473``). Each component builds lazily with plain
``g++`` into a source-hash-keyed cache dir and degrades to the pure-Python
path if the toolchain is missing — nothing here is load-bearing for
correctness, only for input-pipeline throughput.
"""

from .npy_loader import load_mel_batch, native_available, npy_shape

__all__ = ["load_mel_batch", "native_available", "npy_shape"]

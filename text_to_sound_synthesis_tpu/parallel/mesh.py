"""Device mesh + sharding helpers: the TPU-native distributed runtime.

Replaces the reference's entire ``Diffsound/sound_synthesis/distributed/``
package (``launch.py:26-104`` mp.spawn + NCCL process groups,
``distributed.py:16-151`` all_reduce/all_gather wrappers): under SPMD-on-mesh
there are no per-GPU processes to spawn and no hand-written collectives — the
train step is jitted with NamedShardings (batch on the ``data`` axis, params
replicated) and XLA inserts the gradient all-reduce over ICI.

``reduce_dict`` -> metrics come out of the jitted step already reduced;
``DistributedSampler`` -> per-host slicing in the input pipeline (data/loader.py);
multi-host bring-up -> ``jax.distributed.initialize()`` (one process per host).

The mesh is (data, model); model=1 today — the flagship model fits one chip, so
scaling is batch-parallel (SURVEY.md §2 parallelism table) — but every sharding
goes through these helpers so a model axis can be introduced without touching
call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the given devices (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def make_data_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Data-parallel mesh using the largest device count that divides the
    global batch (debug batches may be smaller than the device count)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n != len(devices):
        import warnings

        warnings.warn(
            f"global batch {batch_size} does not divide the {len(devices)} available "
            f"devices; training on {n} device(s) and IDLING {len(devices) - n}. "
            f"Pick a batch size divisible by the device count to use every chip.",
            RuntimeWarning,
            stacklevel=2,
        )
    return make_mesh(devices[:n])


def batch_sharding(mesh: Mesh, *, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 (batch) across 'data'; replicate the rest. Rank-0 leaves
    (python scalars, 0-d arrays — e.g. a step counter in the batch dict) have
    no batch axis to shard and are replicated."""
    if ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, ndim=getattr(x, "ndim", 0))),
        batch,
    )

"""Parameter sharding rules for the (data, model) mesh.

Megatron-style tensor parallelism for the denoiser blocks: column-parallel
q/k/v and MLP-in kernels (shard output features), row-parallel proj/MLP-out
kernels (shard input features); embeddings sharded on the feature axis; biases
and norms replicated. Under GSPMD these are layout constraints — XLA inserts
the matching collectives, so any rule set is correct; these rules make the
all-reduces land once per block, after attn-proj and after MLP-out.

The flagship model fits one chip, so model=1 (pure DP) is the production
setting; the rules exist so the same train step scales to model>1 unchanged
(exercised by __graft_entry__.dryrun_multichip on a 2D virtual mesh).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["megatron_param_shardings", "apply_shardings"]

_COL_PARALLEL = ("query", "key", "value", "mlp_fc1")     # kernel (in, out): shard out
_ROW_PARALLEL = ("proj", "mlp_fc2", "attn_out_proj")     # kernel (in, out): shard in


def _spec_for(path_names, leaf) -> P:
    if leaf.ndim < 2:
        return P()
    parent = path_names[-2] if len(path_names) >= 2 else ""
    name = path_names[-1]
    if name == "kernel":
        if any(parent.startswith(m) or parent == m for m in _COL_PARALLEL):
            return P(*([None] * (leaf.ndim - 1)), "model")
        if any(parent.startswith(m) or parent == m for m in _ROW_PARALLEL):
            return P(*(["model"] + [None] * (leaf.ndim - 1)))
    if name == "embedding" and leaf.ndim == 2:
        return P(None, "model")
    return P()


def megatron_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching ``params``."""

    def one(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        spec = _spec_for(names, leaf)
        # refuse specs that don't divide evenly — fall back to replication
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % axis_sizes[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def apply_shardings(params: Any, shardings: Any) -> Any:
    return jax.tree_util.tree_map(jax.device_put, params, shardings)

"""Mesh construction and sharding rules.

The reference has no distributed backend at all (SURVEY.md section 2.13:
single GPU, batch 1, file-polling trainer/evaluator). Here parallelism
is first-class and rides XLA collectives over ICI/DCN:

  * 'data' axis — couples (frame pairs) are sharded across devices;
    gradient reduction is an XLA all-reduce inserted by pjit.
  * 'model' axis — optional tensor parallelism of the large second-stage
    FC trunks (2048-wide Dense kernels sharded on the output feature
    dim; XLA inserts the all-gathers/reduce-scatters).

No NCCL/MPI analogue exists or is needed: `jax.jit` + `NamedSharding`
over a `Mesh` is the entire communication layer.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# FC trunks whose kernels get tensor-parallel sharding on 'model'
_TP_SUBTREES = ("avod_fc", "corr_fc", "rpn_cls", "rpn_reg")


def make_mesh(num_data: Optional[int] = None,
              num_model: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over available devices."""
    devices = np.array(jax.devices())
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    assert num_data * num_model <= n, (num_data, num_model, n)
    grid = devices[: num_data * num_model].reshape(num_data, num_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis (couples) over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim"):
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def param_shardings(params, mesh: Mesh):
    """Sharding pytree for params: TP for the wide FC kernels (output
    feature dim over 'model'), replicated otherwise."""

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        in_tp = any(k in _TP_SUBTREES for k in keys)
        is_kernel = keys and keys[-1] == "kernel"
        if in_tp and is_kernel and leaf.ndim == 2 and \
                leaf.shape[1] % mesh.shape["model"] == 0:
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)

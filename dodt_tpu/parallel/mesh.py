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


def shard_train_state(state, mesh: Mesh):
    """device_put a TrainState onto the mesh: params (and the EMA
    shadow) get `param_shardings` (TP kernels over 'model', rest
    replicated); optimizer moments inherit the sharding of the param
    leaf they mirror (Adam's mu/nu are params-structured subtrees of
    the opt_state, found by treedef match); everything else (step,
    schedule counts, masked-state internals) is replicated.

    This is the production entry point for tensor parallelism — the
    Trainer calls it so `--num_model > 1` actually lays the FC trunks
    out over the 'model' axis instead of replicating them (the dryrun
    and the bit-parity test exercised `param_shardings` but nothing in
    the real train path ever applied it)."""
    p_sh = param_shardings(state.params, mesh)
    rep = NamedSharding(mesh, P())
    pstruct = jax.tree_util.tree_structure(state.params)

    def is_params_shaped(node):
        try:
            return jax.tree_util.tree_structure(node) == pstruct
        except Exception:  # noqa: BLE001 — non-pytree internals
            return False

    def put(node):
        if is_params_shaped(node):
            return jax.device_put(node, p_sh)
        return jax.device_put(node, rep)

    opt_state = jax.tree_util.tree_map(put, state.opt_state,
                                       is_leaf=is_params_shaped)
    ema = (jax.device_put(state.ema_params, p_sh)
           if state.ema_params is not None else None)
    return state._replace(
        step=jax.device_put(state.step, rep),
        params=jax.device_put(state.params, p_sh),
        opt_state=opt_state, ema_params=ema)

"""Device mesh + sharding layout for multi-chip / multi-host training.

Parallelism strategy (see SURVEY.md §2 "Parallelism & distributed-
communication components"): the env batch (E arenas) is **data-parallel**
over a 1-D ``data`` mesh axis — every per-arena array (EnvState, obs,
rollout buffers) is sharded on its leading E axis; learner params and
optimizer state are **replicated**. Under ``jit`` with these shardings,
XLA's SPMD partitioner emits the gradient all-reduce (psum over ICI/DCN)
automatically from the replicated-params/sharded-batch layout — no
hand-written collectives. TP/PP/SP/EP are structurally unnecessary for
these ≤512-hidden networks (SURVEY.md §2 table rows), so DP is the whole
story; the critic's (B·N, N, h) attention is the hot matmul and it
parallelizes over the sharded batch dimension.

Multi-host: call ``jax.distributed.initialize()`` (one process per host,
``scripts/train.py --distributed``), then the same mesh spans all hosts'
devices and the same program runs SPMD.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env-batch) axis on 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(tree, mesh: Mesh):
    """Place every array in a pytree with its leading axis sharded on
    'data' (rank-0 arrays replicated)."""
    data = batch_sharding(mesh)
    rep = replicated_sharding(mesh)

    def place(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, data)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, tree)


def replicate_pytree(tree, mesh: Mesh):
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def constrain_batch(tree, mesh: Mesh):
    """with_sharding_constraint the leading axis onto 'data' inside jit."""
    spec = P(DATA_AXIS)

    def con(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
        return x

    return jax.tree_util.tree_map(con, tree)

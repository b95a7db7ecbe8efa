"""Device mesh + sharding layout for multi-chip training/sampling.

The reference has no distributed layer at all (SURVEY §2.7); this is new
TPU-first design. The models here are small (~10M params) while the work is
embarrassingly parallel over pockets/samples, so the primary axis is **data
parallelism over the batch dimension** with replicated parameters; XLA
inserts the ICI psum for gradients. A second 'model' axis is kept in the
mesh for future tensor-parallel denoisers on very large pockets.

Everything uses jax.sharding.NamedSharding so the same jitted train step
runs single-chip, v5e-8, or multi-host unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None,
              data: Optional[int] = None, model: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for any [B, ...] leaf."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a PocketLigandBatch with its leading batch dim split over the
    data axis. B must be divisible by the data-axis size."""
    n_data = mesh.shape[DATA_AXIS]
    leaves = jax.tree.leaves(batch)
    if leaves:
        b = leaves[0].shape[0]
        for x in leaves:
            if x.ndim == 0 or x.shape[0] % n_data != 0:
                raise ValueError(
                    f"batch leading dim {x.shape[0] if x.ndim else None} "
                    f"not divisible by data-axis size {n_data}; pad the "
                    f"batch to a multiple of the mesh (leaf shape "
                    f"{x.shape}, batch size {b})")
    sharding = data_parallel_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_params(params, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, replicate(mesh)), params)


def tensor_parallel_shardings(params, mesh: Mesh):
    """Megatron-style layout over the MODEL axis, GSPMD-propagated.

    Dense/embedding kernels split their OUTPUT (last) dim over 'model';
    matching 1-D biases/scales split likewise; leaves not divisible by the
    axis stay replicated. XLA propagates the layout through the graph and
    inserts the ICI collectives — correctness is layout-independent, so
    this composes with any model here (UniTransformer, SchNet, GVP). With
    ~10M-param denoisers TP is a memory/scale capability (very large
    pockets or hidden dims), not a speed lever; the dryrun exercises it so
    the path is compile-checked on every driver run."""
    tp = mesh.shape[MODEL_AXIS]

    def rule(x):
        if tp > 1 and x.ndim >= 2 and x.shape[-1] % tp == 0:
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1) + [MODEL_AXIS])))
        if tp > 1 and x.ndim == 1 and x.shape[0] % tp == 0:
            return NamedSharding(mesh, P(MODEL_AXIS))
        return replicate(mesh)

    return jax.tree.map(rule, params)


def shard_params_tp(params, mesh: Mesh):
    """Place params under the tensor-parallel layout."""
    return jax.tree.map(jax.device_put, params,
                        tensor_parallel_shardings(params, mesh))


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """DCN-level orchestration for multi-host slices (SURVEY §2.7): call
    before any other jax API. On TPU pods every argument auto-detects from
    the environment; on CPU/GPU clusters pass them explicitly. Returns the
    process count. Safe to call when already initialized or single-host."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        pass            # already initialized, or single-process run
    return jax.process_count()


def global_batch_from_host(batch, mesh: Mesh):
    """Multi-host data feeding: each process holds its own per-host batch
    shard (same tree, leading dim = global_B / process_count); assemble
    the global jax.Array sharded over the data axis without gathering
    through host 0. Single-host meshes fall back to shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sharding = data_parallel_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        batch)

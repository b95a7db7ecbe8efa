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

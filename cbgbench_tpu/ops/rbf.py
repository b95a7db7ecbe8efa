"""Radial basis (Gaussian smearing) distance featurization, pure jnp.

(reference: repo/modules/common.py:114-133 GaussianSmearing)

The reference defaults to a *fixed* irregular 20-bin offset table (its
``fixed_offset=True`` path) regardless of start/stop, with coefficient
-0.5 / (offset[1]-offset[0])^2 = -0.5. We reproduce both paths.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FIXED_OFFSETS = np.array(
    [0, 1, 1.25, 1.5, 1.75, 2, 2.25, 2.5, 2.75, 3,
     3.5, 4, 4.5, 5, 5.5, 6, 7, 8, 9, 10], np.float32)


class GaussianSmearingTable:
    """Precomputed offsets/coeff; call as a function on distances [...]->[..., G]."""

    def __init__(self, start: float = 0.0, stop: float = 5.0,
                 num_gaussians: int = 50, fixed_offset: bool = True):
        if fixed_offset:
            offset = FIXED_OFFSETS
        else:
            offset = np.linspace(start, stop, num_gaussians, dtype=np.float32)
        self.offset = jnp.asarray(offset)
        self.coeff = -0.5 / float(offset[1] - offset[0]) ** 2
        self.num_gaussians = len(offset)

    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        if dist.shape[-1] == 1:
            dist = dist[..., 0]
        diff = dist[..., None] - self.offset
        return jnp.exp(self.coeff * diff * diff)


def gaussian_smearing(dist, start=0.0, stop=5.0, num_gaussians=50,
                      fixed_offset=True):
    return GaussianSmearingTable(start, stop, num_gaussians, fixed_offset)(dist)

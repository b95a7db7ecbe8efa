"""SO(3) exponential/log maps and the IGSO(3) angular sampler, pure jnp.

TPU-native rewrite of the reference SO(3) utilities
(reference: repo/models/utils/so3.py). The histogram-based
ApproxAngularDistribution becomes a stateless pytree of precomputed CDF
tables; sampling is inverse-CDF via searchsorted (jittable, batched) instead
of torch.multinomial.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .geometry import quaternion_to_rotation_matrix


def skewsym_to_so3vec(S):
    return jnp.stack([S[..., 1, 2], S[..., 2, 0], S[..., 0, 1]], axis=-1)


def so3vec_to_skewsym(w):
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    o = jnp.zeros_like(x)
    S = jnp.stack([o, z, -y, -z, o, x, y, -x, o], axis=-1)
    return S.reshape(w.shape[:-1] + (3, 3))


def log_rotation(R, stable: bool = True):
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    min_cos = -0.999 if stable else -1.0
    cos_theta = jnp.clip((trace - 1) / 2, min_cos, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1 - cos_theta ** 2, 0.0))
    theta = jnp.arccos(cos_theta)
    coef = ((theta + 1e-8) / (2 * sin_theta + 2e-8))[..., None, None]
    return coef * (R - jnp.swapaxes(R, -1, -2))


def exp_skewsym(S):
    x = jnp.linalg.norm(skewsym_to_so3vec(S), axis=-1)
    I = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), S.shape)
    sinx, cosx = jnp.sin(x), jnp.cos(x)
    b = (sinx + 1e-8) / (x + 1e-8)
    c = (1 - cosx + 1e-8) / (x ** 2 + 2e-8)
    S2 = S @ S
    return I + b[..., None, None] * S + c[..., None, None] * S2


def so3vec_to_rotation(w):
    return exp_skewsym(so3vec_to_skewsym(w))


def rotation_to_so3vec(R):
    return skewsym_to_so3vec(log_rotation(R))


def random_uniform_so3(key, size):
    q = jax.random.normal(key, tuple(size) + (4,))
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    return rotation_to_so3vec(quaternion_to_rotation_matrix(q))


# ---------------------------------------------------------------------------
# IGSO(3) angular distribution (histogram approximation).
# ---------------------------------------------------------------------------

def _igso3_pdf(x: np.ndarray, eps: float, L: int) -> np.ndarray:
    """Truncated IGSO(3) angle density (numpy, precompute-time only)."""
    x = x[:, None]
    c = (1 - np.cos(x)) / math.pi
    l = np.arange(0, L)[None, :]
    a = (2 * l + 1) * np.exp(-l * (l + 1) * (eps ** 2))
    b = (np.sin((l + 0.5) * x) + 1e-6) / (np.sin(x / 2) + 1e-6)
    return (c * a * b).sum(axis=1)


@struct.dataclass
class AngularDistribution:
    """Per-timestep angle distribution tables.

    X:     [T, n_bins]  bin left edges in [0, pi]
    cdf:   [T, n_bins]  normalized CDF over bins (for inverse-CDF sampling)
    stddevs: [T]        the per-step stddev
    approx_flag: [T]    use Gaussian approx when stddev is tiny
    """

    X: jnp.ndarray
    cdf: jnp.ndarray
    stddevs: jnp.ndarray
    approx_flag: jnp.ndarray

    @staticmethod
    def create(stddevs, std_threshold: float = 0.1, num_bins: int = 4096,
               num_iters: int = 1024) -> "AngularDistribution":
        stddevs = np.asarray(stddevs, np.float64)
        x = np.linspace(0, math.pi, num_bins)
        Y = []
        for std in stddevs:
            y = _igso3_pdf(x, float(std), num_iters)
            y = np.nan_to_num(y).clip(min=0)
            Y.append(y)
        Y = np.stack(Y)  # [T, n_bins]
        # histogram over bins [i, i+1); drop last bin weight like the
        # reference's multinomial over prob[:, :-1]
        w = Y[:, :-1]
        w_sum = w.sum(axis=1, keepdims=True)
        w = np.where(w_sum > 0, w / np.maximum(w_sum, 1e-30), 1.0 / w.shape[1])
        cdf = np.cumsum(w, axis=1)
        return AngularDistribution(
            X=jnp.asarray(x, jnp.float32)[None].repeat(len(stddevs), 0),
            cdf=jnp.asarray(cdf, jnp.float32),
            stddevs=jnp.asarray(stddevs, jnp.float32),
            approx_flag=jnp.asarray(stddevs <= std_threshold),
        )

    def sample(self, key, std_idx):
        """Sample angles in [0, pi) for each timestep index. std_idx: [...]."""
        shape = std_idx.shape
        flat = std_idx.reshape(-1)
        k1, k2, k3 = jax.random.split(key, 3)

        # Inverse-CDF histogram sample.
        u = jax.random.uniform(k1, flat.shape)
        cdf_rows = self.cdf[flat]                      # [N, n_bins-1]
        bin_idx = jnp.sum(cdf_rows < u[:, None], axis=1)
        bin_idx = jnp.clip(bin_idx, 0, self.X.shape[1] - 2)
        x_rows = self.X[flat]
        bin_start = jnp.take_along_axis(x_rows, bin_idx[:, None], axis=1)[:, 0]
        bin_end = jnp.take_along_axis(x_rows, bin_idx[:, None] + 1, axis=1)[:, 0]
        samples_hist = bin_start + jax.random.uniform(k2, flat.shape) * (
            bin_end - bin_start)

        # Gaussian approximation for tiny stddevs.
        std = self.stddevs[flat]
        g = std * 2 + jax.random.normal(k3, flat.shape) * std
        samples_gauss = jnp.abs(g) % math.pi

        out = jnp.where(self.approx_flag[flat], samples_gauss, samples_hist)
        return out.reshape(shape)


def random_normal_so3(key, std_idx, angular_distrib: AngularDistribution):
    """Random SO(3) vector with IGSO(3)-distributed angle."""
    k1, k2 = jax.random.split(key)
    u = jax.random.normal(k1, std_idx.shape + (3,))
    u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-12)
    theta = angular_distrib.sample(k2, std_idx)
    return u * theta[..., None]

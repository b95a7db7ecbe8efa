"""EDM/VDM-style variational (gamma-parameterized) diffusion — DiffSBDD.

Reference semantics: VariationalScheduler + DiffsbddVariationalScheduler
(diffusion_scheduler.py:577-1040) and schedule_utils.py (polynomial/cosine
alpha^2, GammaNetwork). Continuous time t in [0, 1], per-graph [B].

The predefined (non-learned) gamma is a lookup table; the learned
GammaNetwork variant lives in nn/gamma.py as a flax module and can be
passed in via the ``gamma_override`` argument of each method.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.segment import masked_mean
from .schedules import per_graph_gen_mean


def clip_noise_schedule(alphas2: np.ndarray, clip_value: float = 0.001):
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    step = np.clip(alphas2[1:] / alphas2[:-1], clip_value, 1.0)
    return np.cumprod(step, axis=0)


def polynomial_alphas2(timesteps: int, s: float = 1e-4, power: float = 3.0):
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1 - 2 * s
    return precision * alphas2 + s


def cosine_alphas2(timesteps: int, s: float = 0.008):
    steps = timesteps + 2
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = np.clip(1 - (ac[1:] / ac[:-1]), 0, 0.999)
    return np.cumprod(1.0 - betas, axis=0)


@struct.dataclass
class VariationalScheduler:
    """gamma(t) table; alpha_t = sqrt(sigmoid(-gamma)), sigma_t =
    sqrt(sigmoid(gamma)). t is continuous in [0,1], rounded to T bins."""

    gamma_table: jnp.ndarray        # [T+1]
    num_timesteps: int = struct.field(pytree_node=False)

    @staticmethod
    def create(num_timesteps: int, kind: str = "polynomial_2",
               precision: float = 5e-4) -> "VariationalScheduler":
        if kind == "cosine":
            alphas2 = cosine_alphas2(num_timesteps)
        elif kind.startswith("polynomial"):
            power = float(kind.split("_")[1])
            alphas2 = polynomial_alphas2(num_timesteps, s=precision, power=power)
        else:
            raise ValueError(kind)
        sigmas2 = 1 - alphas2
        gamma = -(np.log(alphas2) - np.log(sigmas2))
        return VariationalScheduler(
            gamma_table=jnp.asarray(gamma, jnp.float32),
            num_timesteps=num_timesteps)

    def gamma(self, t, gamma_override: Optional[jnp.ndarray] = None):
        """t in [0,1] (any shape) -> gamma(t)."""
        if gamma_override is not None:
            return gamma_override
        t_int = jnp.round(t * self.num_timesteps).astype(jnp.int32)
        t_int = jnp.clip(t_int, 0, self.num_timesteps)
        return self.gamma_table[t_int]

    @staticmethod
    def alpha_of_gamma(g):
        return jnp.sqrt(jax.nn.sigmoid(-g))

    @staticmethod
    def sigma_of_gamma(g):
        return jnp.sqrt(jax.nn.sigmoid(g))

    @staticmethod
    def SNR(g):
        return jnp.exp(-g)

    def forward_add_noise(self, key, x, t, gen_flag, noise=None,
                          zero_center: bool = False, mask=None):
        g = self.gamma(t)[:, None, None]
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        x_noisy = self.alpha_of_gamma(g) * x + self.sigma_of_gamma(g) * noise
        out = jnp.where(gen_flag[..., None], x_noisy, x)
        if zero_center:
            m = gen_flag if mask is None else mask
            com = masked_mean(noise, m, axis=1, keepdims=True)
            com_noise = jnp.broadcast_to(com, noise.shape)
            return out, noise - com_noise, com_noise
        return out, noise

    def get_score_loss(self, pred, tgt, t, gen_flag, score_in: bool = False,
                       info_tag=None):
        g = self.gamma(t)[:, None, None]
        sigma_t = self.sigma_of_gamma(g)
        noise = tgt / sigma_t if score_in else tgt
        mse = jnp.sum((pred - noise) ** 2, axis=-1)
        loss = per_graph_gen_mean(mse, gen_flag)
        info = {"eps_0": noise, "eps_pred": pred, "score_0": noise * sigma_t,
                "score_pred": pred * sigma_t, "mask_gen": gen_flag}
        if info_tag is not None:
            info = {f"{k}_{info_tag}": v for k, v in info.items()}
        return loss, info

    def sigma_and_alpha_t_given_s(self, gamma_t, gamma_s):
        sigma2_t_given_s = -jnp.expm1(jax.nn.softplus(gamma_s)
                                      - jax.nn.softplus(gamma_t))
        log_alpha2_t = jax.nn.log_sigmoid(-gamma_t)
        log_alpha2_s = jax.nn.log_sigmoid(-gamma_s)
        alpha_t_given_s = jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s))
        sigma_t_given_s = jnp.sqrt(sigma2_t_given_s)
        return sigma2_t_given_s, sigma_t_given_s, alpha_t_given_s

    def backward_remove_noise(self, key, x, x_pred, t, gen_flag,
                              zero_mean: bool = False, mask=None):
        g_t = self.gamma(t)[:, None, None]
        g_s = self.gamma(t - 1.0 / self.num_timesteps)[:, None, None]
        s2_ts, s_ts, a_ts = self.sigma_and_alpha_t_given_s(g_t, g_s)
        sigma_t = self.sigma_of_gamma(g_t)
        sigma_s = self.sigma_of_gamma(g_s)
        mu = x / a_ts - (s2_ts / a_ts / sigma_t) * x_pred
        sigma = s_ts * sigma_s / sigma_t
        z = jax.random.normal(key, mu.shape, mu.dtype) * sigma
        if zero_mean:
            m = gen_flag if mask is None else mask
            z = jnp.broadcast_to(masked_mean(z, m, axis=1, keepdims=True),
                                 z.shape)
        return jnp.where(gen_flag[..., None], mu + z, x)

    # ------------------------------------------------------------------
    # DiffSBDD NLL machinery (reference: :670-927)
    # ------------------------------------------------------------------

    @staticmethod
    def subspace_dimensionality(n_nodes, dim: int):
        return (n_nodes - 1) * dim

    @staticmethod
    def gaussian_kl(mu_diff_sq, q_sigma, p_sigma, d):
        return (d * jnp.log(p_sigma / q_sigma)
                + 0.5 * (d * q_sigma ** 2 + mu_diff_sq) / (p_sigma ** 2)
                - 0.5 * d)

    def kl_prior(self, x, gen_flag, dimensions):
        """KL(q(z_T | x) || N(0, I)) per graph. x [B,N,D], gen_flag [B,N]."""
        g_T = self.gamma(jnp.ones((x.shape[0],)))[:, None, None]
        alpha_T = self.alpha_of_gamma(g_T)
        mu = alpha_T * x
        sigma_T = self.sigma_of_gamma(g_T)[:, 0, 0]
        m = gen_flag.astype(x.dtype)[..., None]
        mu_norm2 = jnp.sum((mu * m) ** 2, axis=(1, 2))
        return self.gaussian_kl(mu_norm2, sigma_T, jnp.ones_like(sigma_T),
                                dimensions)

    def log_constants_p_x_given_z0(self, n_nodes, dim: int):
        dof = self.subspace_dimensionality(n_nodes, dim)
        gamma_0 = self.gamma(jnp.zeros_like(n_nodes, dtype=jnp.float32))
        log_sigma_x = 0.5 * gamma_0
        return dof * (-log_sigma_x - 0.5 * jnp.log(2 * jnp.pi))

    def log_px_given_z0_continuous(self, eps, net_eps, gen_flag):
        sq = jnp.sum((eps - net_eps) ** 2, axis=-1)       # [B, N]
        m = gen_flag.astype(sq.dtype)
        return -0.5 * jnp.sum(sq * m, axis=1)

    def log_ph_given_z0_discrete(self, c0, z_h, gamma_0, gen_flag,
                                 epsilon: float = 1e-10):
        """Discrete likelihood of one-hot types under the /4 normalization
        (reference: :816-844)."""
        norm_value = 4.0
        sigma_0 = self.sigma_of_gamma(gamma_0)[:, None, None] * norm_value
        onehot = c0 * norm_value
        est = z_h * norm_value
        centered = est - 1
        cdf = lambda v: 0.5 * (1.0 + jax.lax.erf(v / math.sqrt(2)))  # noqa: E731
        # clamp: f32 erf can be microscopically non-monotone when saturated,
        # making the probability-mass difference slightly negative -> NaN log
        diff = jnp.maximum(cdf((centered + 0.5) / sigma_0)
                           - cdf((centered - 0.5) / sigma_0), 0.0)
        logp = jnp.log(diff + epsilon)
        logZ = jax.scipy.special.logsumexp(logp, axis=-1, keepdims=True)
        log_probs = logp - logZ
        m = gen_flag.astype(logp.dtype)
        return jnp.sum(jnp.sum(log_probs * onehot, axis=-1) * m, axis=1)

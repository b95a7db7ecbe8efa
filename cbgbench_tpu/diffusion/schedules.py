"""Noise-schedule tables (numpy precompute -> jnp pytrees).

Reference semantics: repo/models/diffusion/diffusion_scheduler.py:27-109
(VPScheduler beta families) and schedule_utils.py:25-57 (variational
alpha^2 schedules). Schedulers are stateless pytrees; every random op takes
an explicit PRNG key. Time indices ``t`` are per-graph ``[B]`` arrays and
broadcast against padded node tensors ``[B, N, ...]``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


def make_beta_schedule(kind: str, num_timesteps: int, beta_start: float = 1e-7,
                       beta_end: float = 2e-3, cosine_s: float = 0.008) -> np.ndarray:
    if kind == "quad":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_timesteps,
                            dtype=np.float64) ** 2
    elif kind == "linear":
        betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
    elif kind == "const":
        betas = beta_end * np.ones(num_timesteps, dtype=np.float64)
    elif kind == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(num_timesteps, 1, num_timesteps, dtype=np.float64)
    elif kind == "sigmoid":
        x = np.linspace(-6, 6, num_timesteps)
        betas = 1 / (1 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    elif kind == "cosine":
        # alpha here is sqrt(alpha) of Ho et al. (reference quirk kept:
        # diffusion_scheduler.py:83-96)
        s = cosine_s
        steps = num_timesteps + 1
        x = np.linspace(0, steps, steps)
        ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
        ac = ac / ac[0]
        alphas = np.clip(ac[1:] / ac[:-1], 0.001, 1.0)
        betas = 1.0 - np.sqrt(alphas)
    else:
        raise NotImplementedError(kind)
    assert betas.shape == (num_timesteps,)
    return betas


@struct.dataclass
class VPTables:
    """Precomputed variance-preserving diffusion tables, all [T]."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    posterior_mean_c0_coef: jnp.ndarray
    posterior_mean_ct_coef: jnp.ndarray
    posterior_var: jnp.ndarray
    posterior_logvar: jnp.ndarray

    @staticmethod
    def create(kind: str, num_timesteps: int, beta_start: float = 1e-7,
               beta_end: float = 2e-3, cosine_s: float = 0.008) -> "VPTables":
        betas = make_beta_schedule(kind, num_timesteps, beta_start, beta_end,
                                   cosine_s)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas, axis=0)
        ac_prev = np.append(1.0, ac[:-1])
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        post_logvar = np.log(np.append(post_var[1], post_var[1:]))
        f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        return VPTables(
            betas=f32(betas), alphas=f32(alphas), alphas_cumprod=f32(ac),
            alphas_cumprod_prev=f32(ac_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(ac)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1 - ac)),
            posterior_mean_c0_coef=f32(betas * np.sqrt(ac_prev) / (1 - ac)),
            posterior_mean_ct_coef=f32((1 - ac_prev) * np.sqrt(alphas) / (1 - ac)),
            posterior_var=f32(post_var), posterior_logvar=f32(post_logvar),
        )

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def per_graph_gen_mean(per_node, gen_flag, eps: float = 1e-8):
    """[B, N] per-node losses -> scalar: mean over generated atoms per graph,
    then mean over graphs (matches reference scatter_mean(...).mean())."""
    g = gen_flag.astype(per_node.dtype)
    per_graph = jnp.sum(per_node * g, axis=1) / jnp.maximum(g.sum(axis=1), eps)
    return jnp.mean(per_graph)

"""Continuous (coordinate) diffusion schedulers for the padded layout.

Reference semantics: CTNVPScheduler / CTNVEScheduler
(repo/models/diffusion/diffusion_scheduler.py:112-317). All tensors are
padded per-graph: x [B, N, 3], t [B] int32, gen_flag/mask [B, N] bool.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.segment import masked_mean
from .schedules import VPTables, per_graph_gen_mean


@struct.dataclass
class CTNVPScheduler:
    """Variance-preserving Gaussian diffusion over coordinates.

    ``pred_type='score'``: network predicts -eps so that pred/sigma = score.
    ``pred_type='denoise'``: network predicts x0; posterior q(x_{t-1}|x_t,x0).
    """

    tables: VPTables

    @staticmethod
    def create(num_timesteps: int, beta_start: float = 1e-7,
               beta_end: float = 2e-3, kind: str = "sigmoid",
               cosine_s: float = 0.008) -> "CTNVPScheduler":
        return CTNVPScheduler(VPTables.create(kind, num_timesteps, beta_start,
                                              beta_end, cosine_s))

    @property
    def num_timesteps(self) -> int:
        return self.tables.num_timesteps

    def forward_add_noise(self, key, x, t, gen_flag, noise=None,
                          zero_center: bool = False,
                          mask: Optional[jnp.ndarray] = None):
        """q(x_t | x_0) on generated atoms; context atoms stay fixed.

        Returns (x_noisy, noise) or, with zero_center, (x_noisy, pos_noise,
        com_noise) where noise is split into a per-graph CoM part and a
        zero-CoM residual (DiffBP decomposition)."""
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        a = self.tables.alphas_cumprod[t][:, None, None]          # [B,1,1]
        x_noisy = jnp.sqrt(a) * x + jnp.sqrt(1.0 - a) * noise
        out = jnp.where(gen_flag[..., None], x_noisy, x)
        if zero_center:
            m = gen_flag if mask is None else mask
            com = masked_mean(noise, m, axis=1, keepdims=True)
            com_noise = jnp.broadcast_to(com, noise.shape)
            pos_noise = noise - com_noise
            return out, pos_noise, com_noise
        return out, noise

    def _posterior_mean(self, x0, xt, t):
        c0 = self.tables.posterior_mean_c0_coef[t][:, None, None]
        ct = self.tables.posterior_mean_ct_coef[t][:, None, None]
        return c0 * x0 + ct * xt

    def backward_remove_noise(self, key, x_pred, x_noisy, t, gen_flag,
                              pred_type: str = "score"):
        """One reverse step x_t -> x_{t-1} on generated atoms."""
        nonzero = (t > 0).astype(x_noisy.dtype)[:, None, None]
        z = jax.random.normal(key, x_noisy.shape, x_noisy.dtype)
        if pred_type == "score":
            a = self.tables.alphas_cumprod[t][:, None, None]
            b = self.tables.betas[t][:, None, None]
            sigma = jnp.sqrt(1.0 - a)
            score = -x_pred / sigma
            xs = (x_noisy + b * score) / jnp.sqrt(1.0 - b)
            xs = xs + nonzero * jnp.sqrt(b) * z
        else:
            xs_mean = self._posterior_mean(x_pred, x_noisy, t)
            logvar = self.tables.posterior_logvar[t][:, None, None]
            xs = xs_mean + nonzero * jnp.exp(0.5 * logvar) * z
        return jnp.where(gen_flag[..., None], xs, x_noisy)

    def backward_strided(self, key, x_pred, x_noisy, t, s, gen_flag,
                         eta: float = 1.0):
        """One reverse jump x_t -> x_s for any s < t (x0 parameterization).

        Generalizes ``backward_remove_noise(pred_type='denoise')`` to
        non-adjacent steps: at s = t-1 and eta = 1 it reduces exactly to
        the unit-step posterior q(x_{t-1}|x_t, x0). ``s = -1`` means
        "decode to clean x0" (abar_s = 1): the mean collapses to x_pred
        and the variance to 0, which is exactly the legacy loop's t = 0
        behavior. eta scales the stochasticity (Song et al. 2021 DDIM,
        eq. 12): eta = 1 is strided ancestral DDPM, eta = 0 is
        deterministic DDIM. No reference counterpart — the reference
        samples the full T steps only (targetdiff.py:181)."""
        ab = self.tables.alphas_cumprod
        abar_t = ab[t][:, None, None]
        abar_s = jnp.where((s >= 0)[:, None, None],
                           ab[jnp.maximum(s, 0)][:, None, None], 1.0)
        alpha_ts = abar_t / abar_s
        # sigma^2 = eta^2 * (1-abar_s)/(1-abar_t) * (1-alpha_ts): the
        # strided DDPM posterior variance at eta=1, zero at s=-1
        var = (1.0 - abar_s) / (1.0 - abar_t) * (1.0 - alpha_ts)
        sigma = eta * jnp.sqrt(jnp.maximum(var, 0.0))
        if eta == 1.0:
            # posterior-coefficient form: bitwise-comparable to the
            # precomputed unit-step tables at s = t-1
            c0 = jnp.sqrt(abar_s) * (1.0 - alpha_ts) / (1.0 - abar_t)
            ct = jnp.sqrt(alpha_ts) * (1.0 - abar_s) / (1.0 - abar_t)
            mean = c0 * x_pred + ct * x_noisy
        else:
            eps_hat = ((x_noisy - jnp.sqrt(abar_t) * x_pred)
                       / jnp.sqrt(1.0 - abar_t))
            dir_coef = jnp.sqrt(jnp.maximum(1.0 - abar_s - sigma ** 2, 0.0))
            mean = jnp.sqrt(abar_s) * x_pred + dir_coef * eps_hat
        z = jax.random.normal(key, x_noisy.shape, x_noisy.dtype)
        xs = mean + (s >= 0).astype(x_noisy.dtype)[:, None, None] * sigma * z
        return jnp.where(gen_flag[..., None], xs, x_noisy)

    def xs_mean(self, x_pred, x_noisy, t, gen_flag, pred_type: str = "score"):
        if pred_type == "score":
            a = self.tables.alphas_cumprod[t][:, None, None]
            b = self.tables.betas[t][:, None, None]
            sigma = jnp.sqrt(1.0 - a)
            score = -x_pred / sigma
            xs = (x_noisy + b * score) / jnp.sqrt(1.0 - b)
        else:
            xs = self._posterior_mean(x_pred, x_noisy, t)
        return jnp.where(gen_flag[..., None], xs, x_noisy)

    def get_loss(self, x_pred, x0, xt, t, gen_flag, pred_type: str = "score"):
        """MSE to the score / x0 target, per-graph gen-mean then batch mean."""
        if pred_type == "score":
            a = self.tables.alphas_cumprod[t][:, None, None]
            sigma = jnp.sqrt(1.0 - a)
            tgt = (x0 - xt) / sigma
        else:
            tgt = x0
        mse = jnp.sum((x_pred - tgt) ** 2, axis=-1)        # [B, N]
        loss = per_graph_gen_mean(mse, gen_flag)
        info = {"x0": x0, "xt": xt, "x_pred": x_pred, "mask_gen": gen_flag}
        return loss, info

    def get_score_loss(self, pred, tgt, t, gen_flag, score_in: bool = False,
                       info_tag: Optional[str] = None):
        """MSE to a provided eps target (DiffBP-style split losses)."""
        a = self.tables.alphas_cumprod[t][:, None, None]
        sigma = jnp.sqrt(1.0 - a)
        noise = tgt / sigma if score_in else tgt
        mse = jnp.sum((pred - noise) ** 2, axis=-1)
        loss = per_graph_gen_mean(mse, gen_flag)
        info = {"eps_0": noise, "eps_pred": pred, "score_0": noise * sigma,
                "score_pred": pred * sigma, "mask_gen": gen_flag}
        if info_tag is not None:
            info = {f"{k}_{info_tag}": v for k, v in info.items()}
        return loss, info


@struct.dataclass
class CTNVEScheduler:
    """Variance-exploding (log-sigma ladder) coordinate diffusion.
    (reference: diffusion_scheduler.py:222-317; used by GraphBP-family.)"""

    sigmas: jnp.ndarray            # [T+1]
    sigma_min: float = struct.field(pytree_node=False, default=0.01)
    sigma_max: float = struct.field(pytree_node=False, default=10.0)

    @staticmethod
    def create(num_timesteps: int, sigma_min: float, sigma_max: float,
               kind: str = "log") -> "CTNVEScheduler":
        if kind != "log":
            raise NotImplementedError(kind)
        sig = np.exp(np.linspace(np.log(sigma_min), np.log(sigma_max),
                                 num_timesteps + 1))
        return CTNVEScheduler(sigmas=jnp.asarray(sig, jnp.float32),
                              sigma_min=sigma_min, sigma_max=sigma_max)

    @property
    def num_timesteps(self) -> int:
        return self.sigmas.shape[0] - 1

    def forward_add_global_noise(self, key, x, t, gen_flag):
        """Per-graph shared noise scaled by sigma_t (one draw per graph)."""
        b = x.shape[0]
        noise = jax.random.normal(key, (b, 1, x.shape[-1]), x.dtype)
        noise_expand = jnp.broadcast_to(noise, x.shape)
        sigma = self.sigmas[t][:, None, None]
        x_noisy = x + sigma * noise_expand
        return jnp.where(gen_flag[..., None], x_noisy, x), noise_expand

    def get_score_loss(self, pred, tgt, t, gen_flag, score_in: bool = False,
                       info_tag=None):
        sigma = self.sigmas[t][:, None, None]
        noise = tgt / sigma if score_in else tgt
        mse = jnp.sum((pred - noise) ** 2, axis=-1)
        loss = per_graph_gen_mean(mse, gen_flag)
        info = {"eps_0": noise, "eps_pred": pred, "score_0": noise * sigma,
                "score_pred": pred * sigma, "mask_gen": gen_flag}
        if info_tag is not None:
            info = {f"{k}_{info_tag}": v for k, v in info.items()}
        return loss, info

    def backward_remove_noise(self, key, x_pred, x_noisy, t, gen_flag):
        """Annealed-Langevin reverse step (reference: :272-294)."""
        sigma = self.sigmas[t][:, None, None]
        g = sigma * jnp.sqrt(2 * jnp.log(self.sigma_max / self.sigma_min))
        score_norm = 1.0 / sigma
        d = 1.0 / self.num_timesteps
        update = x_pred * score_norm * d * g ** 2
        z = jax.random.normal(key, x_noisy.shape, x_noisy.dtype)
        z = jnp.where((t > 1)[:, None, None], z, 0.0)
        xs = x_noisy - update * z * jnp.sqrt(d) + g * z * jnp.sqrt(d)
        return jnp.where(gen_flag[..., None], xs, x_noisy)

"""SO(3) orientation diffusion (D3FG functional-group frames).

Reference semantics: RotVPScheduler (diffusion_scheduler.py:514-574).
Orientations are SO(3) vectors o [B, N, 3]; t [B]; gen_flag [B, N].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.so3 import (AngularDistribution, random_normal_so3,
                         rotation_to_so3vec, so3vec_to_rotation)
from .schedules import VPTables


@struct.dataclass
class RotVPScheduler:
    tables: VPTables
    angular_fwd: AngularDistribution
    angular_inv: AngularDistribution

    @staticmethod
    def create(num_timesteps: int, beta_start: float = 1e-7,
               beta_end: float = 2e-3, kind: str = "sigmoid",
               cosine_s: float = 0.008) -> "RotVPScheduler":
        from .schedules import make_beta_schedule
        tables = VPTables.create(kind, num_timesteps, beta_start, beta_end,
                                 cosine_s)
        # recompute in numpy (under jit-trace the jnp tables are tracers)
        betas = make_beta_schedule(kind, num_timesteps, beta_start, beta_end,
                                   cosine_s)
        ac = np.cumprod(1.0 - betas)
        c1 = np.sqrt(1 - ac)
        sigmas = np.zeros_like(betas)
        for i in range(1, len(betas)):
            sigmas[i] = ((1 - ac[i - 1]) / (1 - ac[i])) * betas[i]
        sigmas = np.sqrt(sigmas)
        return RotVPScheduler(
            tables=tables,
            angular_fwd=AngularDistribution.create(c1.tolist()),
            angular_inv=AngularDistribution.create(sigmas.tolist()),
        )

    @property
    def num_timesteps(self) -> int:
        return self.tables.num_timesteps

    def forward_add_noise(self, key, o0, t, gen_flag):
        """Noise orientations: R_t = Exp(e_scaled) @ Exp(sqrt(a)*o0)."""
        t_node = jnp.broadcast_to(t[:, None], o0.shape[:2])       # [B, N]
        alpha_bar = self.tables.alphas_cumprod[t_node]
        c0 = jnp.sqrt(alpha_bar)[..., None]
        c1 = jnp.sqrt(1 - alpha_bar)[..., None]
        e_scaled = random_normal_so3(key, t_node, self.angular_fwd)
        e_normal = e_scaled / (c1 + 1e-8)
        E_scaled = so3vec_to_rotation(e_scaled)
        R0_scaled = so3vec_to_rotation(c0 * o0)
        v_noisy = rotation_to_so3vec(E_scaled @ R0_scaled)
        v_noisy = jnp.where(gen_flag[..., None], v_noisy, o0)
        return v_noisy, e_scaled, e_normal

    def backward_remove_noise(self, key, o_pred, ot, t, gen_flag):
        t_node = jnp.broadcast_to(t[:, None], ot.shape[:2])
        e = random_normal_so3(key, t_node, self.angular_inv)
        e = jnp.where((t_node > 1)[..., None], e, 0.0)
        R_next = so3vec_to_rotation(e) @ so3vec_to_rotation(o_pred)
        o_next = rotation_to_so3vec(R_next)
        return jnp.where(gen_flag[..., None], o_next, ot)

    def backward_strided(self, key, o_pred, ot, t, s, gen_flag):
        """Strided reverse jump t -> s. The unit step already re-samples
        around the predicted clean rotation (Exp(e_sigma_t) @ R_pred, no
        R_t dependence — diffab lineage), so a jump simply draws from the
        forward marginal at s: Exp(e_{sqrt(1-abar_s)}) @ Exp(sqrt(abar_s)
        o_pred). s = -1 decodes to the prediction exactly. No reference
        counterpart (full-T sampling only)."""
        s_node = jnp.broadcast_to(s[:, None], ot.shape[:2])
        s_eff = jnp.maximum(s_node, 0)
        abar_s = jnp.where(s_node >= 0,
                           self.tables.alphas_cumprod[s_eff], 1.0)[..., None]
        e = random_normal_so3(key, s_eff, self.angular_fwd)
        e = jnp.where((s_node >= 0)[..., None], e, 0.0)
        R_next = so3vec_to_rotation(e) @ so3vec_to_rotation(
            jnp.sqrt(abar_s) * o_pred)
        o_next = rotation_to_so3vec(R_next)
        return jnp.where(gen_flag[..., None], o_next, ot)

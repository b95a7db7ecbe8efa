"""Learned monotone noise schedule — the VDM GammaNetwork.

Rewrite of the reference's learned-gamma option (reference:
repo/models/diffusion/schedule_utils.py:99-137 GammaNetwork,
139-180 PositiveLinear; selected when schedule_type == 'learned',
diffusion_scheduler.py:582). gamma(t) is a monotonically increasing
map [0,1] -> [gamma_0, gamma_1] built from positive-weight linears:

    gamma~(t) = l1(t) + l3(sigmoid(l2(l1(t))))
    gamma(t)  = gamma_0 + (gamma_1-gamma_0) * (gamma~(t)-gamma~(0))
                                            / (gamma~(1)-gamma~(0))

Positivity is enforced with softplus on the raw kernel (the reference
uses F.softplus on the weight at call time too — same construction).
Plug the output into DiffsbddScheduler via its ``gamma_override``
argument to train the schedule jointly with the score network.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class PositiveLinear(nn.Module):
    features: int
    weight_init_offset: float = -2.0

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ nn.softplus(k + self.weight_init_offset) + b


class GammaNetwork(nn.Module):
    """gamma(t): t of any shape in [0,1] -> same-shape gamma values."""

    hidden: int = 1024

    @nn.compact
    def __call__(self, t):
        shape = t.shape
        t = t.reshape(-1, 1).astype(jnp.float32)
        l1 = PositiveLinear(1, name="l1")
        l2 = PositiveLinear(self.hidden, name="l2")
        l3 = PositiveLinear(1, name="l3")

        def gamma_tilde(u):
            a = l1(u)
            return a + l3(nn.sigmoid(l2(a)))

        g0 = gamma_tilde(jnp.zeros_like(t))
        g1 = gamma_tilde(jnp.ones_like(t))
        gt = gamma_tilde(t)
        normalized = (gt - g0) / (g1 - g0)

        gamma_0 = self.param("gamma_0",
                             lambda k: jnp.asarray([-5.0], jnp.float32))
        gamma_1 = self.param("gamma_1",
                             lambda k: jnp.asarray([10.0], jnp.float32))
        gamma = gamma_0 + (gamma_1 - gamma_0) * normalized
        return gamma.reshape(shape)

"""Shared flax building blocks (reference: repo/modules/common.py)."""

from __future__ import annotations

import math
from typing import Any, Callable

import jax.numpy as jnp
import flax.linen as nn


ACT = {
    "tanh": nn.tanh,
    "relu": nn.relu,
    "softplus": nn.softplus,
    "elu": nn.elu,
    "silu": nn.silu,
    "swish": nn.silu,
    "gelu": nn.gelu,
}


class ShiftedSoftplus(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.softplus(x) - math.log(2.0)


class MLP(nn.Module):
    """Two-plus-layer MLP with LayerNorm+act between layers
    (reference: repo/modules/common.py:151-171). ``dtype`` sets the compute
    precision (bf16 feeds the MXU at full rate; params stay f32)."""

    out_dim: int
    hidden_dim: int
    num_layer: int = 2
    norm: bool = True
    act: str = "relu"
    act_last: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        act: Callable = ACT[self.act]
        for i in range(self.num_layer):
            feat = self.out_dim if i == self.num_layer - 1 else self.hidden_dim
            x = nn.Dense(feat, dtype=self.dtype)(x)
            if i < self.num_layer - 1 or self.act_last:
                if self.norm:
                    x = nn.LayerNorm(dtype=self.dtype)(x)
                x = act(x)
        return x


class SinusoidalPosEmb(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        # x: [..., 1] or [...]
        if x.ndim and x.shape[-1] == 1:
            x = x[..., 0]
        half = self.dim // 2
        emb = math.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half) * -emb)
        ang = x[..., None] * freqs
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def outer_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise feature outer product flattened over the last dims
    (reference: repo/modules/common.py:61-68 for the two-arg case):
    [..., A] x [..., B] -> [..., A*B]."""
    out = a[..., :, None] * b[..., None, :]
    return out.reshape(out.shape[:-2] + (-1,))

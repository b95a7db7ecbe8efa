"""Shared flax building blocks (reference: repo/modules/common.py)."""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
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


class _DenseParams(nn.Module):
    """Declares exactly nn.Dense's param tree (kernel lecun_normal, bias
    zeros, f32) and returns the raw arrays — so callers can fuse several
    projections of the same input into one matmul (concat on the output
    axis). Named to mirror flax auto-naming (``Dense_<i>``)."""

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_dim, self.features))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,))
        return k, b


class _LayerNormParams(nn.Module):
    """nn.LayerNorm's param tree (scale ones, bias zeros) as arrays."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.dim,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.dim,))
        return s, b


def dense_apply(x, kernel, bias, dtype):
    """nn.Dense-equivalent compute (flax promote_dtype semantics: with
    dtype=None everything promotes to the common result type, else all
    cast to ``dtype``)."""
    if dtype is None:
        dtype = jnp.result_type(x.dtype, kernel.dtype, bias.dtype)
    return (jnp.dot(x.astype(dtype), kernel.astype(dtype))
            + bias.astype(dtype))


def layer_norm_apply(x, scale, bias, dtype, eps=1e-6):
    """nn.LayerNorm-equivalent compute: stats in f32 (fast variance),
    normalized value scaled/shifted then cast to the compute dtype."""
    x32 = x.astype(jnp.promote_types(jnp.float32, x.dtype))
    mean = jnp.mean(x32, -1, keepdims=True)
    mean2 = jnp.mean(x32 * x32, -1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    if dtype is None:
        dtype = jnp.result_type(x.dtype, scale.dtype, bias.dtype)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    return y.astype(dtype)


class MLP(nn.Module):
    """Two-plus-layer MLP with LayerNorm+act between layers
    (reference: repo/modules/common.py:151-171). ``dtype`` sets the compute
    precision (bf16 feeds the MXU at full rate; params stay f32).

    Implemented over param-mirrored Dense/LayerNorm (identical param tree
    and init to the nn.Dense/nn.LayerNorm original — pinned by
    tests/test_ops.py golden test) so the first matmul can FUSE a caller
    projection of the same input: ``extra_weight``/``extra_bias`` ride the
    first kernel's output axis and the extra columns are returned
    alongside — one [B,N,D]@[D,H+E] matmul instead of two reads of x
    (the attention modules fuse q = MLP(h) with t_dst = h @ wd + b;
    ~0.05 ms x 18 instances per denoise step at [16,512,128])."""

    out_dim: int
    hidden_dim: int
    num_layer: int = 2
    norm: bool = True
    act: str = "relu"
    act_last: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, extra_weight=None, extra_bias=None):
        act: Callable = ACT[self.act]
        extra_out = None
        for i in range(self.num_layer):
            feat = self.out_dim if i == self.num_layer - 1 else self.hidden_dim
            kern, bias = _DenseParams(feat, x.shape[-1],
                                      name=f"Dense_{i}")()
            if i == 0 and extra_weight is not None:
                # one matmul, two precision contracts: the MLP half
                # reproduces nn.Dense's compute-dtype rounding exactly
                # (f32 accumulation then cast, + bias in dtype); the
                # extra half stays f32 like the bare ``h @ wd_f32 + b``
                # it replaces (TPU runs f32 matmuls at bf16 input
                # precision, so casting inputs changes nothing).
                cdt = self.dtype or jnp.result_type(x.dtype, kern.dtype,
                                                    bias.dtype)
                kcat = jnp.concatenate(
                    [kern.astype(cdt), extra_weight.astype(cdt)], axis=1)
                y = jnp.dot(x.astype(cdt), kcat,
                            preferred_element_type=jnp.float32)
                x = y[..., :feat].astype(cdt) + bias.astype(cdt)
                extra_out = y[..., feat:] + extra_bias
            else:
                x = dense_apply(x, kern, bias, self.dtype)
            if i < self.num_layer - 1 or self.act_last:
                if self.norm:
                    scale, lnb = _LayerNormParams(
                        feat, name=f"LayerNorm_{i}")()
                    x = layer_norm_apply(x, scale, lnb, self.dtype)
                x = act(x)
        if extra_weight is not None:
            return x, extra_out
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

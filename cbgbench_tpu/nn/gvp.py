"""Geometric vector perceptron primitives (padded layout).

Rewrite of the reference GVP/VN modules (reference: repo/modules/gvp/gvn.py
:9-118). Features are pairs (scalar [..., S], vector [..., V, 3]); all ops
broadcast over arbitrary leading batch/node/edge dims.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..utils.geometry import safe_norm

EPS = 1e-6

# torch nn.Linear default init: U(+-1/sqrt(fan_in)), std = 1/sqrt(3*fan_in).
# flax's lecun_normal is 1.73x larger per layer; the GVP stack multiplies
# features (node x edge gates), so the mismatch compounds to ~15x at the
# Pocket2Mol energy head and pins its clamped losses at init. Match torch.
TORCH_LINEAR_INIT = nn.initializers.variance_scaling(1 / 3, "fan_in",
                                                     "uniform")


def TDense(features, use_bias=True, name=None):
    return nn.Dense(features, use_bias=use_bias, name=name,
                    kernel_init=TORCH_LINEAR_INIT)


class VNLinear(nn.Module):
    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        # x: [..., V, 3] -> linear mix over the V channel axis
        return TDense(self.out_channels, use_bias=self.use_bias)(
            jnp.swapaxes(x, -1, -2)).swapaxes(-1, -2)


class VNLeakyReLU(nn.Module):
    in_channels: int
    negative_slope: float = 0.01

    @nn.compact
    def __call__(self, x):
        d = TDense(self.in_channels, use_bias=False)(
            jnp.swapaxes(x, -1, -2)).swapaxes(-1, -2)
        dot = jnp.sum(x * d, axis=-1, keepdims=True)
        mask = (dot >= 0).astype(x.dtype)
        d_norm_sq = jnp.sum(d * d, axis=-1, keepdims=True)
        return (self.negative_slope * x
                + (1 - self.negative_slope)
                * (mask * x + (1 - mask) * (x - (dot / (d_norm_sq + EPS)) * d)))


class GVLinear(nn.Module):
    out_scalar: int
    out_vector: int

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, jnp.ndarray]):
        sca, vec = feats
        in_vector = vec.shape[-2]
        dim_hid = max(in_vector, self.out_vector)
        vec_inter = VNLinear(dim_hid, name="lin_vector")(vec)
        vec_norm = safe_norm(vec_inter, axis=-1)
        sca_cat = jnp.concatenate([vec_norm, sca], axis=-1)
        out_sca = TDense(self.out_scalar, use_bias=False,
                           name="lin_scalar")(sca_cat)
        out_vec = VNLinear(self.out_vector, name="lin_vector2")(vec_inter)
        gate = nn.sigmoid(TDense(self.out_vector,
                                   name="scalar_to_vector_gates")(out_sca))
        return out_sca, gate[..., None] * out_vec


class GVPerceptronVN(nn.Module):
    out_scalar: int
    out_vector: int

    @nn.compact
    def __call__(self, feats):
        sca, vec = GVLinear(self.out_scalar, self.out_vector)(feats)
        return nn.leaky_relu(sca, 0.01), VNLeakyReLU(self.out_vector)(vec)


class MessageModule(nn.Module):
    """Edge-gated scalar/vector messages with cosine-cutoff annealing
    (reference: gvn.py:9-41). Node features come pre-gathered per edge."""

    out_sca: int
    out_vec: int
    hid_sca: int
    hid_vec: int
    cutoff: float = 10.0

    @nn.compact
    def __call__(self, node_feats_src, edge_feats, dist=None,
                 annealing: bool = False):
        node_sca, node_vec = GVLinear(self.out_sca, self.out_vec,
                                      name="node_gvlinear")(node_feats_src)
        edge_sca, edge_vec = GVPerceptronVN(self.hid_sca, self.hid_vec,
                                            name="edge_gvp")(edge_feats)

        y_sca = node_sca * TDense(self.out_sca, name="sca_linear")(edge_sca)
        y_node_vec = TDense(self.out_vec, name="e2n_linear")(
            edge_sca)[..., None] * node_vec
        y_edge_vec = TDense(self.out_vec, name="n2e_linear")(
            node_sca)[..., None] * VNLinear(self.out_vec,
                                            name="edge_vnlinear")(edge_vec)
        y_vec = y_node_vec + y_edge_vec
        out_sca, out_vec = GVLinear(self.out_sca, self.out_vec,
                                    name="out_gvlinear")((y_sca, y_vec))
        if annealing:
            c = 0.5 * (jnp.cos(dist * math.pi / self.cutoff) + 1.0)
            c = c * (dist <= self.cutoff) * (dist >= 0.0)
            out_sca = out_sca * c
            out_vec = out_vec * c[..., None]
        return out_sca, out_vec


class VecExpansion(nn.Module):
    """Unit direction -> V vector channels (reference: common.py:217-225)."""

    edge_channels: int

    @nn.compact
    def __call__(self, edge_vector):
        v = edge_vector / (safe_norm(edge_vector, axis=-1,
                                     keepdims=True) + 1e-7)
        return TDense(self.edge_channels, use_bias=False)(
            v[..., None]).swapaxes(-1, -2)

"""Neighbor attention over padded kNN graphs: X2H (invariant feature
update) and H2X (equivariant coordinate update).

TPU-native rewrite of the reference's scatter-softmax edge attention
(reference: repo/modules/attention/x2h_attention.py:8-100 and
h2x_attention.py:8-73). The flat edge list + scatter_softmax/scatter_sum
becomes a dense [B, N, K, ...] neighbor tensor with a masked softmax over
the K axis — bitwise-equivalent semantics (softmax over each destination
node's incoming edges), but static-shape and MXU-friendly: the edge MLPs
are [B*N*K, F] matmuls.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.rbf import GaussianSmearingTable
from ..ops.segment import masked_softmax
from ..utils.geometry import safe_norm
from .common import MLP, outer_product


class X2HAttention(nn.Module):
    """Invariant multi-head attention: h_i <- h_i + sum_k alpha_ik v_ik.

    Edge features: [edge_type, edge_type (x) RBF(dist), h_i, h_j].
    """

    hidden_dim: int = 128
    n_heads: int = 16
    edge_feat_dim: int = 4
    num_r_gaussian: int = 20
    r_max: float = 10.0
    act: str = "relu"
    norm: bool = True
    ew_net_type: str = "global"        # 'r' | 'm' | 'global' | 'none'
    out_fc: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, rel_x, h_dst, h_src, edge_attr, valid,
                 e_w: Optional[jnp.ndarray] = None):
        """rel_x [B,N,K,3]; h_dst/h_src [B,N,K,D]... h is the center node's
        feature broadcast over K for h_dst; edge_attr [B,N,K,4];
        valid [B,N,K]; e_w [B,N,K,1] (global edge weights) or None."""
        d = self.hidden_dim
        dh = d // self.n_heads

        dist = safe_norm(rel_x, axis=-1, keepdims=True)
        rbf = GaussianSmearingTable(0.0, self.r_max, self.num_r_gaussian)(dist)
        dist_feat = outer_product(edge_attr, rbf)

        kv_input = jnp.concatenate([edge_attr, dist_feat, h_dst, h_src], -1)

        k = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype, name="hk_func")(kv_input)
        k = k.reshape(k.shape[:-1] + (self.n_heads, dh))
        v = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype, name="hv_func")(kv_input)

        if self.ew_net_type == "r":
            e_w = nn.sigmoid(nn.Dense(1, name="ew_net")(dist_feat))
        elif self.ew_net_type == "m":
            e_w = nn.sigmoid(nn.Dense(1, name="ew_net")(v[..., :d]))
        elif e_w is None:
            e_w = 1.0
        v = v * e_w
        v = v.reshape(v.shape[:-1] + (self.n_heads, dh))

        h_center = h_dst[..., 0, :]    # [B, N, D] (h_dst is broadcast over K)
        q = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype, name="hq_func")(h_center)
        q = q.reshape(q.shape[:-1] + (self.n_heads, dh))

        logits = jnp.sum(q[..., None, :, :] * k, -1) / math.sqrt(dh)  # [B,N,K,H]
        alpha = masked_softmax(logits, valid, axis=-2)
        out = jnp.sum(alpha[..., None] * v, axis=-3)        # [B, N, H, dh]
        out = out.reshape(out.shape[:-2] + (d,)).astype(h_center.dtype)

        if self.out_fc:
            out = MLP(d, d, norm=self.norm, act=self.act,
                      name="node_output")(
                jnp.concatenate([out, h_center], -1))
        return out + h_center


class H2XAttention(nn.Module):
    """Equivariant coordinate update: dx_i = mean_h sum_k alpha v_scalar rel_x."""

    hidden_dim: int = 128
    n_heads: int = 16
    edge_feat_dim: int = 4
    num_r_gaussian: int = 20
    r_max: float = 10.0
    act: str = "relu"
    norm: bool = True
    ew_net_type: str = "global"
    dtype: Any = None

    @nn.compact
    def __call__(self, rel_x, h_dst, h_src, edge_attr, valid,
                 e_w: Optional[jnp.ndarray] = None):
        d = self.hidden_dim
        dh = d // self.n_heads

        dist = safe_norm(rel_x, axis=-1, keepdims=True)
        rbf = GaussianSmearingTable(0.0, self.r_max, self.num_r_gaussian)(dist)
        dist_feat = outer_product(edge_attr, rbf)

        kv_input = jnp.concatenate([edge_attr, dist_feat, h_dst, h_src], -1)
        k = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype, name="xk_func")(kv_input)
        k = k.reshape(k.shape[:-1] + (self.n_heads, dh))
        v = MLP(self.n_heads, d, norm=self.norm, act=self.act,
                dtype=self.dtype, name="xv_func")(kv_input)                  # [B,N,K,H] scalars

        if self.ew_net_type == "global" and e_w is not None:
            v = v * e_w
        # ('r' in the reference is dead code feeding edge_index into a Dense;
        #  'm' and None fall through to weight 1.)

        v = v[..., :, None] * rel_x[..., None, :]           # [B,N,K,H,3]

        h_center = h_dst[..., 0, :]
        q = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype, name="xq_func")(h_center)
        q = q.reshape(q.shape[:-1] + (self.n_heads, dh))

        logits = jnp.sum(q[..., None, :, :] * k, -1) / math.sqrt(dh)
        alpha = masked_softmax(logits, valid, axis=-2)      # [B,N,K,H]
        out = jnp.sum(alpha[..., None] * v, axis=-3)        # sum over K -> [B,N,H,3]
        return out.mean(axis=-2).astype(rel_x.dtype)        # [B,N,3]

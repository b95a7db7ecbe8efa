"""Dense-graph GNN zoo: GCN, GAT, GraphSAGE + JK/pooling wrappers.

Rewrite of the reference GNN encoder family (reference: repo/modules/gnn/
gnn.py:59-233 convs, 237-321 GNN/JK, 324-400 GNNPred) for padded dense 2D
molecular graphs [B, NA, NA]. PyG sparse propagation becomes adjacency
matmuls (MXU-native); scatter softmax becomes a masked softmax over the
neighbor axis; self-loops become `adj + I`. BatchNorm becomes LayerNorm
(no cross-example batch statistics — keeps the layer pure under jit and
identical between train and eval).

All layers share the reference's message convention: the neighbor's
feature plus a bond-type embedding, msg_ij = h_j + e(bond_ij).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.segment import masked_mean
from .gin import GINLayer

_NEG = -1e30


def _self_loop_adj(bond, mask, dtype):
    """Adjacency with self-loops from a dense bond matrix.

    Returns (adj [..., NA, NA], loop [..., NA, NA]) where `loop` marks the
    self-loop entries (reference adds them as bond type 4,
    gnn.py:44,93,157,217 — here they carry their own embedding instead).
    """
    adj = (bond > 0).astype(dtype) * mask[..., None, :] * mask[..., :, None]
    n = bond.shape[-1]
    loop = jnp.eye(n, dtype=dtype) * mask[..., None, :]
    return adj, loop


class GCNLayer(nn.Module):
    """Symmetric-normalized graph convolution (reference gnn.py:59-106)."""

    emb_dim: int = 128
    num_bond_types: int = 5

    @nn.compact
    def __call__(self, h, bond, mask):
        adj, loop = _self_loop_adj(bond, mask, h.dtype)
        a = adj + loop
        deg = a.sum(-1)
        dinv = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12)), 0.0)
        norm = dinv[..., :, None] * a * dinv[..., None, :]

        h = nn.Dense(self.emb_dim)(h)
        e = nn.Embed(self.num_bond_types, self.emb_dim, name="edge_emb")(bond)
        loop_e = self.param("loop_emb", nn.initializers.normal(0.02),
                            (self.emb_dim,))
        # msg_i = sum_j norm_ij (h_j + e_ij); split into a matmul over h
        # and an edge term so the h-path stays a single MXU contraction.
        msg = jnp.einsum("...ij,...jd->...id", norm, h)
        msg = msg + jnp.sum(e * (norm * adj)[..., None], axis=-2)
        msg = msg + (norm * loop).sum(-1)[..., None] * loop_e
        return msg


class GATLayer(nn.Module):
    """Dense multi-head graph attention (reference gnn.py:109-182)."""

    emb_dim: int = 128
    heads: int = 2
    num_bond_types: int = 5
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, h, bond, mask):
        adj, loop = _self_loop_adj(bond, mask, h.dtype)
        a = adj + loop
        na = bond.shape[-1]

        x = nn.Dense(self.heads * self.emb_dim, name="weight_linear")(h)
        x = x.reshape(x.shape[:-1] + (self.heads, self.emb_dim))
        e = nn.Embed(self.num_bond_types, self.heads * self.emb_dim,
                     name="edge_emb")(bond)
        e = e.reshape(e.shape[:-1] + (self.heads, self.emb_dim))
        loop_e = self.param("loop_emb", nn.initializers.normal(0.02),
                            (self.heads, self.emb_dim))
        e = e * adj[..., None, None] + loop[..., None, None] * loop_e

        # x_j + e_ij per directed pair: [..., NA(dst), NA(src), H, D]
        xj = jnp.broadcast_to(x[..., None, :, :, :],
                              e.shape[:-4] + (na, na, self.heads, self.emb_dim))
        xj = xj + e
        att = self.param("att", nn.initializers.glorot_uniform(),
                         (self.heads, 2 * self.emb_dim))
        logits = (jnp.einsum("...ihd,hd->...ih", x, att[:, :self.emb_dim])
                  [..., :, None, :]
                  + jnp.einsum("...ijhd,hd->...ijh", xj,
                               att[:, self.emb_dim:]))
        logits = nn.leaky_relu(logits, self.negative_slope)
        logits = jnp.where(a[..., None] > 0, logits, _NEG)
        alpha = nn.softmax(logits, axis=-2)              # over src j
        alpha = alpha * (a[..., None] > 0)
        out = jnp.einsum("...ijh,...ijhd->...ihd", alpha, xj)
        bias = self.param("bias", nn.initializers.zeros, (self.emb_dim,))
        return out.mean(axis=-2) + bias                  # mean over heads


class SAGELayer(nn.Module):
    """GraphSAGE with mean aggregation + L2 output norm (gnn.py:185-233)."""

    emb_dim: int = 128
    num_bond_types: int = 5

    @nn.compact
    def __call__(self, h, bond, mask):
        adj, loop = _self_loop_adj(bond, mask, h.dtype)
        a = adj + loop
        h = nn.Dense(self.emb_dim)(h)
        e = nn.Embed(self.num_bond_types, self.emb_dim, name="edge_emb")(bond)
        loop_e = self.param("loop_emb", nn.initializers.normal(0.02),
                            (self.emb_dim,))
        msg = jnp.einsum("...ij,...jd->...id", a, h)
        msg = msg + jnp.sum(e * adj[..., None], axis=-2)
        msg = msg + loop.sum(-1)[..., None] * loop_e
        deg = jnp.maximum(a.sum(-1, keepdims=True), 1.0)
        out = msg / deg
        nrm = jnp.sqrt(jnp.maximum(jnp.sum(out * out, -1, keepdims=True),
                                   1e-12))
        return out / nrm


class GNNEncoder(nn.Module):
    """Stacked convs with jumping-knowledge combine (gnn.py:237-321).

    gnn_type in {'gin','gcn','gat','graphsage'}; jk in
    {'last','concat','max','sum'}.
    """

    num_layers: int = 3
    emb_dim: int = 128
    num_atom_types: int = 16
    num_bond_types: int = 5
    gnn_type: str = "gin"
    jk: str = "last"

    @nn.compact
    def __call__(self, atype, bond, mask):
        h = nn.Embed(self.num_atom_types, self.emb_dim, name="atom_emb")(atype)
        h_list = [h]
        for i in range(self.num_layers):
            if self.gnn_type == "gin":
                h = GINLayer(self.emb_dim, self.num_bond_types,
                             name=f"conv_{i}")(h, bond, mask)
            elif self.gnn_type == "gcn":
                h = GCNLayer(self.emb_dim, self.num_bond_types,
                             name=f"conv_{i}")(h, bond, mask)
            elif self.gnn_type == "gat":
                h = GATLayer(self.emb_dim, num_bond_types=self.num_bond_types,
                             name=f"conv_{i}")(h, bond, mask)
            elif self.gnn_type == "graphsage":
                h = SAGELayer(self.emb_dim, self.num_bond_types,
                              name=f"conv_{i}")(h, bond, mask)
            else:
                raise ValueError(f"unknown gnn_type {self.gnn_type!r}")
            h = nn.LayerNorm(name=f"norm_{i}")(h)
            if i < self.num_layers - 1:
                h = nn.relu(h)
            h_list.append(h)

        if self.jk == "last":
            return h_list[-1]
        if self.jk == "concat":
            return jnp.concatenate(h_list, axis=-1)
        stacked = jnp.stack(h_list, axis=0)
        if self.jk == "max":
            return stacked.max(axis=0)
        if self.jk == "sum":
            return stacked.sum(axis=0)
        raise ValueError(f"unknown jk {self.jk!r}")


class GNNGraphPred(nn.Module):
    """Graph-level prediction head (reference GNNPred, gnn.py:324-400).

    graph_pooling in {'sum','mean','max','attention'} (the reference's
    Set2Set option is an LSTM pooler no CBGBench config uses — omitted).
    """

    num_layers: int = 3
    emb_dim: int = 128
    num_tasks: int = 1
    num_atom_types: int = 16
    num_bond_types: int = 5
    gnn_type: str = "gin"
    jk: str = "last"
    graph_pooling: str = "mean"

    @nn.compact
    def __call__(self, atype, bond, mask):
        h = GNNEncoder(self.num_layers, self.emb_dim, self.num_atom_types,
                       self.num_bond_types, self.gnn_type, self.jk,
                       name="gnn")(atype, bond, mask)
        m = mask.astype(h.dtype)
        if self.graph_pooling == "mean":
            pooled = masked_mean(h, mask, axis=-2)
        elif self.graph_pooling == "sum":
            pooled = (h * m[..., None]).sum(axis=-2)
        elif self.graph_pooling == "max":
            pooled = jnp.where(mask[..., None], h, _NEG).max(axis=-2)
        elif self.graph_pooling == "attention":
            gate = nn.Dense(1, name="gate_nn")(h)
            gate = jnp.where(mask[..., None], gate, _NEG)
            w = nn.softmax(gate, axis=-2) * m[..., None]
            pooled = (w * h).sum(axis=-2)
        else:
            raise ValueError(f"unknown pooling {self.graph_pooling!r}")
        return nn.Dense(self.num_tasks, name="graph_pred_linear")(pooled)

"""GVPTransformer: scalar/vector message-passing encoder (Pocket2Mol, FLAG).

Padded rewrite of the reference GVPTransformer
(reference: repo/modules/e3nn/gvptransformer.py). Edges are kNN neighbors
whose type is looked up from the dense ligand bond adjacency (the
reference coalesces bond ∪ kNN with bond priority; with k=48, bonded atoms
are always within the neighborhood so the adjacency lookup is equivalent).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.knn import gather_neighbors, gather_neighbors_multi, knn_neighbors
from ..ops.rbf import GaussianSmearingTable
from ..ops.segment import masked_sum
from ..utils.geometry import safe_norm
from .gvp import (GVLinear, GVPerceptronVN, MessageModule, VecExpansion,
                  VNLeakyReLU)


def lookup_edge_type(ctx_bond, idx, nl: int):
    """Neighbor bond classes from the dense ligand-ligand adjacency.

    ctx_bond [B, NL, NL]; idx [B, N, K] neighbor indices into the composed
    node set where nodes < nl are ligand-context atoms. Non-ligand pairs and
    non-bonded pairs -> 0."""
    b, n, k = idx.shape
    dst = jnp.arange(n)[None, :, None]
    is_lig_pair = (dst < nl) & (idx < nl)
    dst_c = jnp.clip(dst, 0, nl - 1)
    src_c = jnp.clip(idx, 0, nl - 1)
    # gather adjacency rows: one-hot matmul is overkill for int8 lookup;
    # flatten to [B, NL*NL] and index with dst*NL+src via one-hot dot.
    flat = ctx_bond.reshape(b, -1).astype(jnp.float32)
    lin = (dst_c * nl + src_c).reshape(b, -1)                # [B, N*K]
    onehot = jax.nn.one_hot(lin, nl * nl, dtype=jnp.float32)
    vals = jax.lax.dot_general(onehot, flat[..., None],
                               (((2,), (1,)), ((0,), (0,))))[..., 0]
    et = jnp.round(vals).astype(jnp.int32).reshape(b, n, k)
    return jnp.where(is_lig_pair, et, 0)


class AttentionInteractionBlockVN(nn.Module):
    hidden_sca: int = 128
    hidden_vec: int = 128
    edge_channels: int = 128
    num_edge_types: int = 5
    r_max: float = 10.0

    @nn.compact
    def __call__(self, h, vec, rel_x, h_src, vec_src, edge_onehot, valid):
        dist = safe_norm(rel_x, axis=-1, keepdims=True)
        rbf = GaussianSmearingTable(
            0.0, self.r_max, self.edge_channels - self.num_edge_types,
            fixed_offset=False)(dist)
        edge_sca = jnp.concatenate([rbf, edge_onehot], axis=-1)
        edge_vec = VecExpansion(self.edge_channels)(rel_x)

        msg_sca, msg_vec = MessageModule(
            self.hidden_sca, self.hidden_vec, self.edge_channels,
            self.edge_channels, self.r_max, name="message_module")(
            (h_src, vec_src), (edge_sca, edge_vec), dist, annealing=True)

        aggr_sca = masked_sum(msg_sca, valid, axis=-2)        # [B,N,S]
        aggr_vec = masked_sum(msg_vec, valid[..., None], axis=-3)

        out_sca, out_vec = GVLinear(self.hidden_sca, self.hidden_vec,
                                    name="centroid_lin")((h, vec))
        out_sca = nn.LayerNorm()(out_sca + aggr_sca)
        out_vec = nn.LayerNorm(reduction_axes=(-2, -1),
                               feature_axes=(-2, -1))(out_vec + aggr_vec)
        return GVLinear(self.hidden_sca, self.hidden_vec,
                        name="out_transform")(
            (nn.leaky_relu(out_sca, 0.01),
             VNLeakyReLU(self.hidden_vec)(out_vec)))


class GVPTransformer(nn.Module):
    num_layers: int = 6
    node_feat_dim: int = 128
    vec_feat_dim: int = 128
    num_edge_types: int = 5        # bond classes incl. 0 = knn-only
    k: int = 48
    r_max: float = 10.0

    @nn.compact
    def __call__(self, x, vec, h, mask, ctx_bond=None, nl: Optional[int] = None):
        """x [B,N,3], vec [B,N,V,3], h [B,N,S], mask [B,N];
        ctx_bond [B,NL,NL] bond adjacency of the first nl nodes."""
        idx, valid = knn_neighbors(x, mask, self.k)
        if ctx_bond is not None and nl:
            edge_type = lookup_edge_type(ctx_bond, idx, nl)
        else:
            edge_type = jnp.zeros(idx.shape, jnp.int32)
        edge_onehot = jax.nn.one_hot(edge_type, self.num_edge_types)
        x_src = gather_neighbors(x, idx)
        rel_x = x[:, :, None] - x_src           # dst - src

        for i in range(self.num_layers):
            h_src = gather_neighbors(h, idx)
            vec_src = gather_neighbors(
                vec.reshape(vec.shape[:2] + (-1,)), idx).reshape(
                idx.shape + vec.shape[-2:])
            dh, dvec = AttentionInteractionBlockVN(
                hidden_sca=self.node_feat_dim, hidden_vec=self.vec_feat_dim,
                edge_channels=self.vec_feat_dim,
                num_edge_types=self.num_edge_types, r_max=self.r_max,
                name=f"block_{i}")(h, vec, rel_x, h_src, vec_src,
                                   edge_onehot, valid)
            h = h + dh
            vec = vec + dvec
        return h, vec

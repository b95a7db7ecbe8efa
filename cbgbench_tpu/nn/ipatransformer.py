"""IPATransformer: invariant-attention denoiser over SE(3) frames (D3FG).

Padded rewrite of the reference IPATransformer (file itatransformer.py,
class IPATransformer — the registry accepts both names;
reference: repo/modules/e3nn/itatransformer.py:14-189): a stack of X2H
(invariant) attention layers over frame centers, then per-node heads emit
a quaternion frame update (R_next = R_o @ U) and a frame-local coordinate
eps rotated to global by R_o.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.knn import gather_neighbors, gather_neighbors_multi, knn_neighbors
from ..ops.rbf import GaussianSmearingTable
from ..utils.geometry import quaternion_1ijk_to_rotation_matrix, safe_norm
from ..utils.so3 import rotation_to_so3vec, so3vec_to_rotation
from .attention import X2HAttention
from .common import MLP, ShiftedSoftplus
from .unitransformer import build_edge_type


class IPATransformer(nn.Module):
    num_classes: Optional[int] = None
    num_blocks: int = 1
    num_layers: int = 6
    hidden_dim: int = 128
    n_heads: int = 16
    edge_feat_dim: int = 4
    act: str = "relu"
    norm: bool = True
    k: int = 32
    r_max: float = 10.0
    ew_net_type: str = "global"
    num_r_gaussian: int = 20
    num_x2h: int = 1
    x2h_out_fc: bool = False

    @nn.compact
    def __call__(self, x, o, h, mask, lig_flag, gen_flag):
        """x [B,N,3] frame centers, o [B,N,3] SO(3) vecs, h [B,N,D].
        Returns (eps_pos, h, o_next, R_next, class logits or None)."""
        layers = [
            X2HAttention(hidden_dim=self.hidden_dim, n_heads=self.n_heads,
                         edge_feat_dim=self.edge_feat_dim,
                         num_r_gaussian=self.num_r_gaussian,
                         r_max=self.r_max, act=self.act, norm=self.norm,
                         out_fc=self.x2h_out_fc, name=f"x2h_{i}")
            for i in range(self.num_layers)
        ]
        if self.ew_net_type == "global":
            dist_gate = MLP(1, self.num_r_gaussian * 8, num_layer=2,
                            norm=True, act="relu", name="dist_emb_mlp")
            rbf_table = GaussianSmearingTable(0.0, self.r_max,
                                              self.num_r_gaussian)

        for _ in range(self.num_blocks):
            idx, valid = knn_neighbors(x, mask, self.k)
            edge_attr = build_edge_type(lig_flag, idx, valid)
            x_src = gather_neighbors(x, idx)
            rel_x = x[:, :, None] - x_src
            if self.ew_net_type == "global":
                dist = safe_norm(rel_x, axis=-1, keepdims=True)
                e_w = nn.sigmoid(dist_gate(rbf_table(dist)))
            else:
                e_w = None
            for layer in layers:
                h_src = gather_neighbors(h, idx)
                h_dst = jnp.broadcast_to(h[:, :, None], h_src.shape)
                h = layer(rel_x, h_dst, h_src, edge_attr, valid, e_w)

        eps_rot = MLP(3, 2 * self.hidden_dim, num_layer=3, norm=False,
                      name="eps_rot_net")(h)
        U = quaternion_1ijk_to_rotation_matrix(eps_rot)
        R_o = so3vec_to_rotation(o)
        R_next = R_o @ U
        o_next = rotation_to_so3vec(R_next)
        o_next = jnp.where(gen_flag[..., None], o_next, o)

        eps_crd = MLP(3, 2 * self.hidden_dim, num_layer=3, norm=False,
                      name="eps_crd_net")(h)
        eps_pos = jnp.einsum("bnij,bnj->bni", R_o, eps_crd)
        eps_pos = jnp.where(gen_flag[..., None], eps_pos, 0.0)

        if self.num_classes is not None:
            c = nn.Dense(self.hidden_dim, name="cls_fc1")(h)
            c = ShiftedSoftplus()(c)
            c = nn.Dense(self.num_classes, name="cls_fc2")(c)
            return eps_pos, h, o_next, R_next, c
        return eps_pos, h, o_next, R_next, None

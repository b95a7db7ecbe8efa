"""GIN over padded dense 2D molecular graphs (FLAG's comb head).

Rewrite of the reference GNNPred/GIN (reference: repo/modules/gnn/gnn.py:
16-441): message passing via adjacency matmuls (MXU-native) instead of
PyG sparse propagation. Used to score candidate motif attachments.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.segment import masked_mean


class GINLayer(nn.Module):
    emb_dim: int = 128
    num_bond_types: int = 5

    @nn.compact
    def __call__(self, h, bond, mask):
        """h [..., NA, D], bond [..., NA, NA] int, mask [..., NA]."""
        adj = (bond > 0).astype(h.dtype) * mask[..., None, :]
        bond_emb = nn.Embed(self.num_bond_types, self.emb_dim,
                            name="edge_emb")(bond)
        msg = jnp.einsum("...ij,...jd->...id", adj, h) + \
            jnp.sum(bond_emb * adj[..., None], axis=-2)
        eps = self.param("eps", nn.initializers.zeros, ())
        out = (1 + eps) * h + msg
        out = nn.Dense(2 * self.emb_dim)(out)
        out = nn.relu(out)
        return nn.Dense(self.emb_dim)(out)


class GINPred(nn.Module):
    """Graph-level scalar score (mean pooling)."""

    num_layers: int = 3
    emb_dim: int = 128
    num_atom_types: int = 16
    num_bond_types: int = 5

    @nn.compact
    def __call__(self, atype, bond, mask):
        h = nn.Embed(self.num_atom_types, self.emb_dim, name="atom_emb")(atype)
        for i in range(self.num_layers):
            h = GINLayer(self.emb_dim, self.num_bond_types,
                         name=f"gin_{i}")(h, bond, mask)
            if i < self.num_layers - 1:
                h = nn.relu(h)
        pooled = masked_mean(h, mask, axis=-2)
        return nn.Dense(1, name="pred_head")(pooled)[..., 0]

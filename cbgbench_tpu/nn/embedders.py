"""Context embedders: raw pocket/ligand features -> node embeddings.

Padded-layout rewrite of PLContextEmbedder / FGContextEmbedder
(reference: repo/modules/context_emb.py:24-231).
"""

from __future__ import annotations

from typing import Optional

import jax
import flax.linen as nn
import jax.numpy as jnp

from ..constants.protein import NUM_AA_NAMES, NUM_POCKET_ATOM_FEAT
from ..utils.geometry import construct_3d_basis
from ..utils.so3 import rotation_to_so3vec
from .common import SinusoidalPosEmb


class TimeEmbedding(nn.Module):
    """'sin' -> sinusoidal + MLP; 'linear' -> Dense on the scalar t."""

    emb_dim: int
    kind: str = "sin"

    @nn.compact
    def __call__(self, t):
        if self.kind == "sin":
            h = SinusoidalPosEmb(self.emb_dim)(t)
            h = nn.Dense(self.emb_dim * 4)(h)
            h = nn.gelu(h)
            return nn.Dense(self.emb_dim)(h)
        if self.kind == "linear":
            return nn.Dense(self.emb_dim)(t)
        raise ValueError(f"unknown time embedding: {self.kind}")


class PLContextEmbedder(nn.Module):
    """Full-atom protein-ligand embedder.

    Inputs (padded): ligand one-hot/class features c_lig [B, NL, C], receptor
    atom features v_rec [B, NR, 7], receptor aa one-hot [B, NR, 20],
    lig/rec indicator flags, per-graph time t [B].
    Returns (h_lig [B, NL, D], h_rec [B, NR, D]).
    """

    emb_dim: int = 128
    num_atom_classes: int = 13
    time_kind: Optional[str] = None       # None | 'sin' | 'linear'
    atom_kind: Optional[str] = "linear"
    residue_kind: Optional[str] = "linear"

    @nn.compact
    def __call__(self, c_lig, v_rec, aa_rec, lig_flag, rec_flag, t=None):
        b, nl = c_lig.shape[:2]
        nr = v_rec.shape[1]

        if t is None:
            t_lig = jnp.zeros((b, nl, 1))
            t_rec = jnp.zeros((b, nr, 1))
        else:
            t_f = t.astype(jnp.float32)
            t_lig = jnp.broadcast_to(t_f[:, None, None], (b, nl, 1))
            t_rec = jnp.broadcast_to(t_f[:, None, None], (b, nr, 1))

        if self.time_kind is not None:
            time_emb = TimeEmbedding(self.emb_dim, self.time_kind)
            t_emb_lig = time_emb(t_lig)
            t_emb_rec = time_emb(t_rec)
        else:
            t_emb_lig = jnp.zeros((b, nl, self.emb_dim))
            t_emb_rec = jnp.zeros((b, nr, self.emb_dim))

        if self.atom_kind == "linear":
            h_lig = nn.Dense(self.emb_dim, name="ligand_atom_emb")(c_lig)
            h_rec = nn.Dense(self.emb_dim, name="protein_atom_emb")(v_rec)
        else:
            raise ValueError(self.atom_kind)

        if self.residue_kind == "linear":
            h_aa = nn.Dense(self.emb_dim, name="residue_emb")(aa_rec)
        else:
            h_aa = jnp.zeros((b, nr, self.emb_dim))

        indicator = nn.Dense(self.emb_dim, name="ligand_indicator")
        bias_lig = indicator(lig_flag.astype(jnp.float32)[..., None])
        bias_rec = indicator(rec_flag.astype(jnp.float32)[..., None])

        h_lig = h_lig + t_emb_lig + bias_lig
        h_rec = h_rec + t_emb_rec + h_aa + bias_rec
        return h_lig, h_rec


def protein_atom_features(element: jnp.ndarray, is_backbone: jnp.ndarray):
    """element index + backbone flag -> [B, NR, 7] one-hot feature
    (reference: repo/datasets/transforms/protein_featurizer.py:7-43)."""
    onehot = jax.nn.one_hot(element, NUM_POCKET_ATOM_FEAT - 1)
    return jnp.concatenate(
        [onehot, is_backbone.astype(jnp.float32)[..., None]], axis=-1)


def aa_onehot(aa: jnp.ndarray):
    return jax.nn.one_hot(aa, NUM_AA_NAMES)


class FGContextEmbedder(nn.Module):
    """Coarse-grained (functional-group frame) embedder for D3FG.

    Ligand nodes are FG frames (center + orientation + class); receptor
    nodes are residues with backbone frames derived from CA/C/N
    (reference: repo/modules/context_emb.py:24-135).
    """

    emb_dim: int = 128
    num_classes: int = 49            # num_fgtype + num_aa_types
    time_kind: Optional[str] = None

    @nn.compact
    def __call__(self, c_lig, v_rec, aa_rec, pos_heavyatom, lig_flag,
                 rec_flag, t=None):
        b, nl = c_lig.shape[:2]
        nr = v_rec.shape[1]

        # Residue backbone frame -> SO(3) vector (CA at slot 1, C 2, N 0).
        R_rec = construct_3d_basis(pos_heavyatom[:, :, 1],
                                   pos_heavyatom[:, :, 2],
                                   pos_heavyatom[:, :, 0])
        o_rec = rotation_to_so3vec(R_rec)

        if t is None:
            t_lig = jnp.zeros((b, nl, 1))
            t_rec = jnp.zeros((b, nr, 1))
        else:
            t_f = t.astype(jnp.float32)
            t_lig = jnp.broadcast_to(t_f[:, None, None], (b, nl, 1))
            t_rec = jnp.broadcast_to(t_f[:, None, None], (b, nr, 1))

        if self.time_kind is not None:
            time_emb = TimeEmbedding(self.emb_dim, self.time_kind)
            t_emb_lig = time_emb(t_lig)
            t_emb_rec = time_emb(t_rec)
        else:
            t_emb_lig = jnp.zeros((b, nl, self.emb_dim))
            t_emb_rec = jnp.zeros((b, nr, self.emb_dim))

        h_lig = nn.Dense(self.emb_dim, name="ligand_fg_emb")(c_lig)
        h_rec = nn.Dense(self.emb_dim, name="protein_fg_emb")(v_rec)
        h_aa = nn.Dense(self.emb_dim, name="residue_emb")(aa_rec)

        indicator = nn.Dense(self.emb_dim, name="ligand_indicator")
        bias_lig = indicator(lig_flag.astype(jnp.float32)[..., None])
        bias_rec = indicator(rec_flag.astype(jnp.float32)[..., None])

        h_lig = h_lig + t_emb_lig + bias_lig
        h_rec = h_rec + t_emb_rec + h_aa + bias_rec
        return h_lig, h_rec, o_rec

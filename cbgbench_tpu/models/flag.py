"""FLAG: autoregressive motif-by-motif generation.

TPU-native rebuild of the reference FLAG
(reference: repo/models/autoregression/flag.py:58-617): GVP context
encoder; next-motif classifier conditioned on the focal motif's pooled
features + current motif embedding; GIN attachment (comb) scorer over
candidate 2D graphs; ligand-frontier/protein-contact focal BCE; distance-
matrix MSE for placing new motif atoms.

Divergences from the reference, by design:
  * motif vocabulary is harvested from data with signature keys and mean
    template geometries (chem/moltree.py) instead of a fixed SMILES
    vocab.txt + RDKit conformers — the RDKit-in-the-loop conformer
    embedding (flag.py:161-170) has no TPU-image equivalent;
  * sampling places new motifs by least-squares embedding of the predicted
    distance matrix (classical MDS + Kabsch, as the reference's
    eig_coord_from_dist/kabsch_torch do) using template geometry, without
    the RDKit UFF/dihedral refinement stage.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.flag_data import FLAGBatch
from ..nn.embedders import PLContextEmbedder, aa_onehot, protein_atom_features
from ..nn.gin import GINPred
from ..nn.gvptransformer import GVPTransformer
from ..nn.common import MLP
from ..ops.knn import gather_neighbors
from ..ops.segment import masked_mean, masked_sum
from ..utils.registry import MODELS
from .pocket2mol import bce_logits


class FLAG(nn.Module):
    # shared train-step API (t unused by AR losses)
    num_timesteps: int = 1
    time_sampler: str = "uniform"
    num_classes: int = 13
    vocab_size: int = 128          # motif classes (start token = vocab_size)
    emb_dim: int = 128
    vec_dim: int = 64
    num_layers: int = 6
    k: int = 48
    r_max: float = 10.0
    loss_weights: tuple = ()

    @classmethod
    def from_config(cls, cfg):
        enc = cfg["encoder"]
        return cls(num_classes=cfg["num_atomtype"],
                   vocab_size=cfg.get("vocab_size", 128),
                   emb_dim=enc.get("node_feat_dim", 128),
                   vec_dim=enc.get("vec_feat_dim", 64),
                   num_layers=enc.get("num_layers", 6),
                   k=enc.get("k", 48), r_max=enc.get("r_max", 10.0),
                   loss_weights=tuple(sorted(
                       cfg.get("loss_weights", {}).items())))

    def setup(self):
        self.embedder = PLContextEmbedder(
            emb_dim=self.emb_dim, num_atom_classes=self.num_classes)
        self.encoder = GVPTransformer(
            num_layers=self.num_layers, node_feat_dim=self.emb_dim,
            vec_feat_dim=self.vec_dim, k=self.k, r_max=self.r_max)
        self.voc_embedding = nn.Embed(self.vocab_size + 1, self.emb_dim)
        self.W = nn.Dense(self.emb_dim)
        self.W_o = nn.Dense(self.vocab_size)
        self.comb_head = GINPred(num_layers=3, emb_dim=self.emb_dim,
                                 num_atom_types=max(self.num_classes, 16))
        self.focal_mlp_ligand = MLP(1, self.emb_dim)
        self.focal_mlp_protein = MLP(1, self.emb_dim)
        self.dist_mlp = MLP(1, self.emb_dim)
        self.new_atom_emb = nn.Embed(self.num_classes, self.emb_dim)
        # torsion head (reference: flag.py alpha_mlp, 3*D -> angle)
        self.alpha_mlp = MLP(2, self.emb_dim * 3)

    def encode(self, batch: FLAGBatch):
        c_lig = jax.nn.one_hot(batch.ctx_atype, self.num_classes)
        v_rec = protein_atom_features(batch.rec_element, batch.rec_is_backbone)
        aa = aa_onehot(batch.rec_aa)
        h_lig, h_rec = self.embedder(c_lig, v_rec, aa, batch.ctx_mask,
                                     batch.rec_mask, None)
        x = jnp.concatenate([batch.ctx_pos, batch.rec_pos], axis=1)
        h = jnp.concatenate([h_lig, h_rec], axis=1)
        mask = jnp.concatenate([batch.ctx_mask, batch.rec_mask], axis=1)
        vec = jnp.zeros(x.shape[:2] + (self.vec_dim, 3))
        vec = vec.at[..., 0, :].set(x)
        nl = batch.ctx_pos.shape[1]
        h, vec = self.encoder(x, vec, h, mask, ctx_bond=batch.ctx_bond, nl=nl)
        return x, h, vec, mask, nl

    def motif_logits(self, h_lig, batch: FLAGBatch):
        h_focal = gather_neighbors(h_lig, batch.focal_atoms)   # [B, NF, D]
        node_hidden = masked_sum(h_focal, batch.focal_mask, axis=1)
        motif_hidden = self.voc_embedding(batch.current_wid)
        pred = nn.relu(self.W(jnp.concatenate([node_hidden, motif_hidden],
                                              axis=-1)))
        return self.W_o(pred)

    def __call__(self, batch: FLAGBatch, t=None, rng=None):
        x, h, vec, mask, nl = self.encode(batch)
        h_lig, h_rec = h[:, :nl], h[:, nl:]

        # next-motif CE
        logits = self.motif_logits(h_lig, batch)
        pred_ce = -jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                       batch.next_wid[:, None], 1)[:, 0]
        loss_pred = pred_ce.mean()

        # attachment (comb) BCE over candidate graphs
        comb_logit = self.comb_head(batch.cand_atype, batch.cand_bond,
                                    batch.cand_mask)           # [B, NCAND]
        comb_bce = bce_logits(comb_logit, batch.cand_labels)
        loss_comb = masked_sum(comb_bce[..., None], batch.cand_valid,
                               axis=1)[..., 0]
        denom = jnp.maximum(batch.cand_valid.sum(1), 1)
        loss_comb = (loss_comb / denom).mean()

        # focal BCE (ligand frontier + protein contact)
        lf = self.focal_mlp_ligand(h_lig)[..., 0]
        pf = self.focal_mlp_protein(h_rec)[..., 0]
        loss_focal = (
            masked_mean(bce_logits(lf, batch.ctx_frontier.astype(jnp.float32)
                                   )[..., None], batch.ctx_mask, axis=1).mean()
            + masked_mean(bce_logits(pf, batch.rec_contact.astype(jnp.float32)
                                     )[..., None], batch.rec_mask,
                          axis=1).mean())

        # distance-matrix MSE: (rec embedding, new-atom type embedding)
        h_dm_rec = gather_neighbors(h_rec, batch.dm_rec_idx)
        h_new = self.new_atom_emb(batch.dm_new_atype)
        pred_d = self.dist_mlp(jnp.concatenate([h_dm_rec, h_new], -1))[..., 0]
        dm_err = (pred_d - batch.dm_true) ** 2
        loss_dm = masked_mean(dm_err[..., None], batch.dm_mask, axis=1).mean()

        # torsion von Mises loss on the graft-bond dihedral
        take = lambda arr, i: gather_neighbors(  # noqa: E731
            arr, i[:, None, None])[:, 0, 0]
        tor_in = jnp.concatenate(
            [take(h_lig, batch.tor_attach), take(h_lig, batch.tor_nbr),
             self.new_atom_emb(batch.tor_new_atype)], axis=-1)
        sincos = self.alpha_mlp(tor_in)
        pred_angle = jnp.arctan2(sincos[..., 0], sincos[..., 1])
        from ..utils.geometry import von_mises_loss
        tv = batch.tor_valid.astype(jnp.float32)
        loss_tor = jnp.sum(von_mises_loss(pred_angle, batch.tor_true) * tv) \
            / jnp.maximum(tv.sum(), 1.0)

        losses = {"pred": loss_pred, "comb": loss_comb, "focal": loss_focal,
                  "dm": loss_dm, "torsion": loss_tor}
        results = {"motif_logits": logits, "next_wid": batch.next_wid,
                   "mask_gen": jnp.ones_like(batch.next_wid, bool)}
        return losses, results

    def weighted_loss(self, loss_dict):
        w = dict(self.loss_weights)
        return sum(w.get(k, 1.0) * v for k, v in loss_dict.items())

    # ------------------------------------------------------------------

    def predict_step(self, batch: FLAGBatch, from_protein: bool = False):
        """Sampling-time heads for the host growth loop
        (reference: flag.py:172-221 sample_init + :251-389 sample):
        motif logits, focal logits (lig/rec), comb logits over candidate
        graphs, predicted rec<->new-atom distances (dm fields), and the
        graft-bond torsion angle (tor fields).

        from_protein pools the motif-head node hidden from protein atoms
        given in focal_atoms (the reference's sample_init step, where no
        ligand exists yet)."""
        x, h, vec, mask, nl = self.encode(batch)
        h_lig, h_rec = h[:, :nl], h[:, nl:]
        h_pool = h_rec if from_protein else h_lig
        h_focal = gather_neighbors(h_pool, batch.focal_atoms)
        node_hidden = masked_sum(h_focal, batch.focal_mask, axis=1)
        motif_hidden = self.voc_embedding(batch.current_wid)
        motif_logits = self.W_o(nn.relu(self.W(
            jnp.concatenate([node_hidden, motif_hidden], axis=-1))))
        lf = jnp.where(batch.ctx_mask, self.focal_mlp_ligand(h_lig)[..., 0],
                       -1e9)
        pf = jnp.where(batch.rec_mask, self.focal_mlp_protein(h_rec)[..., 0],
                       -1e9)
        comb_logit = jnp.where(batch.cand_valid,
                               self.comb_head(batch.cand_atype,
                                              batch.cand_bond,
                                              batch.cand_mask), -1e9)
        # rec-reference -> new-atom distances (same head as the dm loss)
        h_dm_rec = gather_neighbors(h_rec, batch.dm_rec_idx)
        h_new = self.new_atom_emb(batch.dm_new_atype)
        pred_dm = self.dist_mlp(
            jnp.concatenate([h_dm_rec, h_new], -1))[..., 0]
        # graft-bond torsion
        take = lambda arr, i: gather_neighbors(  # noqa: E731
            arr, i[:, None, None])[:, 0, 0]
        tor_in = jnp.concatenate(
            [take(h_lig, batch.tor_attach), take(h_lig, batch.tor_nbr),
             self.new_atom_emb(batch.tor_new_atype)], axis=-1)
        sincos = self.alpha_mlp(tor_in)
        pred_angle = jnp.arctan2(sincos[..., 0], sincos[..., 1])
        return motif_logits, lf, pf, comb_logit, pred_dm, pred_angle


@MODELS.register("flag")
def _build_flag(cfg):
    return FLAG.from_config(cfg)

"""Pocket2Mol: autoregressive atom-by-atom generation.

TPU-native rebuild of the reference Pocket2Mol
(reference: repo/models/autoregression/pocket2mol.py:50-845): a GVP
encoder over the composed pocket graph feeds four heads — focal classifier
(BCE on frontier atoms), MDN position predictor, query-atom type classifier
(label-smoothed CE), bond classifier with triangle-edge attention, plus the
energy-based real/fake contrastive pair.

Sampling is redesigned for fixed shapes: a host loop appends one atom per
graph per step into pre-allocated padded buffers. Each step draws 10 MDN
position candidates, classifies element/bonds for all of them in one
batched head call, and keeps the best candidate that clears the
reference's per-factor log-prob thresholds (pocket2mol.py:263-289,
716-790) — the dynamic candidate re-batching becomes a static [B, NC]
axis on the device.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.p2m import P2MBatch
from ..nn.embedders import PLContextEmbedder, aa_onehot, protein_atom_features
from ..nn.gvp import GVLinear, GVPerceptronVN
from ..nn.gvptransformer import GVPTransformer
from ..nn.predict_heads import AtomEdgePredictor, PositionPredictor
from ..ops.knn import gather_neighbors
from ..ops.segment import masked_mean
from ..utils.registry import MODELS


def smooth_cross_entropy(logits, targets, num_classes, smoothing=0.1):
    t = jax.nn.one_hot(targets, num_classes)
    t = t * (1 - smoothing) + smoothing / (num_classes - 1) * (1 - t)
    lsm = jax.nn.log_softmax(logits, axis=-1)
    return -(t * lsm).sum(-1)


def bce_logits(logits, targets):
    return (jnp.clip(logits, 0, None) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


class Pocket2Mol(nn.Module):
    # shared train-step API (t unused by AR losses)
    num_timesteps: int = 1
    time_sampler: str = "uniform"
    num_classes: int = 13
    num_edge_classes: int = 5      # num_bondtype + 1 in reference terms
    emb_dim: int = 128
    vec_dim: int = 64
    num_layers: int = 6
    k: int = 48
    r_max: float = 10.0
    num_components: int = 3
    loss_weights: tuple = ()

    @classmethod
    def from_config(cls, cfg) -> "Pocket2Mol":
        enc = cfg["encoder"]
        return cls(
            num_classes=cfg["num_atomtype"],
            num_edge_classes=cfg.get("num_bondtype", 4) + 1,
            emb_dim=enc.get("node_feat_dim", 128),
            vec_dim=enc.get("vec_feat_dim", 64),
            num_layers=enc.get("num_layers", 6),
            k=enc.get("k", 48),
            r_max=enc.get("r_max", 10.0),
            num_components=enc.get("num_components", 3),
            loss_weights=tuple(sorted(cfg.get("loss_weights", {}).items())),
        )

    def setup(self):
        self.embedder = PLContextEmbedder(
            emb_dim=self.emb_dim, num_atom_classes=self.num_classes)
        self.encoder = GVPTransformer(
            num_layers=self.num_layers, node_feat_dim=self.emb_dim,
            vec_feat_dim=self.vec_dim, num_edge_types=self.num_edge_classes,
            k=self.k, r_max=self.r_max)
        self.focal_gvp = GVPerceptronVN(self.emb_dim // 2, self.vec_dim // 2)
        self.focal_out = GVLinear(1, 1)
        self.pos_pred = PositionPredictor(self.emb_dim // 2, self.vec_dim // 2,
                                          self.num_components)
        self.atom_edge_pred = AtomEdgePredictor(
            num_classes=self.num_classes,
            num_edge_classes=self.num_edge_classes,
            node_feat_dim=self.emb_dim, vec_feat_dim=self.vec_dim,
            k=min(self.k, 32), r_max=self.r_max)

    # ------------------------------------------------------------------

    def encode(self, batch: P2MBatch):
        """Embed + compose + GVP-encode. Returns (x, h, vec, masks)."""
        c_lig = jax.nn.one_hot(batch.ctx_atype, self.num_classes)
        v_rec = protein_atom_features(batch.rec_element, batch.rec_is_backbone)
        aa = aa_onehot(batch.rec_aa)
        h_lig, h_rec = self.embedder(c_lig, v_rec, aa, batch.ctx_mask,
                                     batch.rec_mask, None)
        x = jnp.concatenate([batch.ctx_pos, batch.rec_pos], axis=1)
        h = jnp.concatenate([h_lig, h_rec], axis=1)
        mask = jnp.concatenate([batch.ctx_mask, batch.rec_mask], axis=1)
        # vector features start as the position lifted to V channels
        vec = jnp.zeros(x.shape[:2] + (self.vec_dim, 3)) + x[..., None, :] * 0
        vec = vec.at[..., 0, :].set(x)
        nl = batch.ctx_pos.shape[1]
        h, vec = self.encoder(x, vec, h, mask, ctx_bond=batch.ctx_bond, nl=nl)
        return x, h, vec, mask, nl

    def focal_logits(self, h, vec):
        return self.focal_out(self.focal_gvp((h, vec)))[0][..., 0]

    def _tri_features(self, batch: P2MBatch):
        """Pairwise (edge, edge) geometry for the candidate-edge attention:
        rel vector between ctx endpoints + bond-class one-hot between them
        (reference: contrastive_sampler.py construct_tri_edge)."""
        idx = batch.con_edge_ctx                       # [B, NC, EK]
        pos_a = gather_neighbors(batch.ctx_pos, idx)   # [B, NC, EK, 3]
        rel_ab = pos_a[..., :, None, :] - pos_a[..., None, :, :]
        b, nc, ek = idx.shape
        nlc = batch.ctx_pos.shape[1]
        lin = idx[..., :, None] * nlc + idx[..., None, :]
        flat = batch.ctx_bond.reshape(b, -1).astype(jnp.float32)
        onehot = jax.nn.one_hot(lin.reshape(b, -1), nlc * nlc)
        vals = jax.lax.dot_general(onehot, flat[..., None],
                                   (((2,), (1,)), ((0,), (0,))))[..., 0]
        tri_type = jnp.round(vals).astype(jnp.int32).reshape(b, nc, ek, ek)
        same = jnp.eye(ek, dtype=bool)[None, None]
        tri_type = jnp.where(same, -1, tri_type)   # self-pair -> all-zero feat
        tri_feat = jax.nn.one_hot(tri_type, self.num_edge_classes)
        return rel_ab, tri_feat

    def __call__(self, batch: P2MBatch, t=None, rng=None):
        """Training loss (t unused; present for the shared train-step API)."""
        x, h, vec, mask, nl = self.encode(batch)
        h_lig, h_rec = h[:, :nl], h[:, nl:]
        vec_lig, vec_rec = vec[:, :nl], vec[:, nl:]

        # ---- focal BCE (clamped at 10 like the reference) ----
        lig_logit = self.focal_logits(h_lig, vec_lig)
        rec_logit = self.focal_logits(h_rec, vec_rec)
        m_lig = batch.ctx_pred_flag & batch.ctx_mask
        m_rec = batch.rec_pred_flag & batch.rec_mask
        loss_lig_focal = jnp.clip(masked_mean(
            bce_logits(lig_logit, batch.ctx_focal_flag.astype(jnp.float32)
                       )[..., None], m_lig, axis=(1,)).mean(), None, 10.0)
        loss_rec_focal = jnp.clip(masked_mean(
            bce_logits(rec_logit, batch.rec_focal_flag.astype(jnp.float32)
                       )[..., None], m_rec, axis=(1,)).mean(), None, 10.0)

        # ---- MDN position losses ----
        def mdn_loss(edge, edge_mask, h_side, vec_side, x_side):
            fi = edge[..., 0]
            h_f = gather_neighbors(h_side, fi[..., None])[:, :, 0]
            vec_f = gather_neighbors(
                vec_side.reshape(vec_side.shape[:2] + (-1,)),
                fi[..., None])[:, :, 0].reshape(
                fi.shape + vec_side.shape[-2:])
            x_f = gather_neighbors(x_side, fi[..., None])[:, :, 0]
            _, mu, sigma, pi = self.pos_pred(h_f, vec_f, x_f)
            tgt = gather_neighbors(batch.msk_pos, edge[..., 1:2])[:, :, 0]
            p = PositionPredictor.mdn_probability(mu, sigma, pi, tgt)
            nll = -jnp.log(p + 1e-16)
            return jnp.clip(masked_mean(nll[..., None], edge_mask,
                                        axis=(1,)).mean(), None, 10.0)

        loss_pos_lig = mdn_loss(batch.lig_focal_edge,
                                batch.lig_focal_edge_mask,
                                h_lig, vec_lig, batch.ctx_pos)
        loss_pos_rec = mdn_loss(batch.rec_focal_edge,
                                batch.rec_focal_edge_mask,
                                h_rec, vec_rec, batch.rec_pos)

        # ---- atom type + bonds on real targets ----
        tri_rel, tri_feat = self._tri_features(batch)
        y_real, edge_pred = self.atom_edge_pred(
            x, h, vec, mask, batch.con_pos_real, batch.con_mask,
            edge_ctx_idx=batch.con_edge_ctx, edge_mask=batch.con_edge_mask,
            tri_rel=tri_rel, tri_feat=tri_feat)
        loss_atom = jnp.clip(masked_mean(
            smooth_cross_entropy(y_real, batch.con_type_real,
                                 self.num_classes)[..., None],
            batch.con_mask, axis=(1,)).mean(), None, 10.0)
        edge_ce = -jnp.take_along_axis(
            jax.nn.log_softmax(edge_pred, -1),
            batch.con_edge_type[..., None], axis=-1)[..., 0]
        loss_edge = jnp.clip(masked_mean(
            edge_ce[..., None], batch.con_edge_mask, axis=(1, 2)).mean(),
            None, 10.0)

        # ---- contrastive energies ----
        y_fake, _ = self.atom_edge_pred(
            x, h, vec, mask, batch.con_pos_fake, batch.con_mask)
        e_real = jnp.clip(-jax.nn.logsumexp(y_real, axis=-1), None, 40.0)
        e_fake = jnp.clip(-jax.nn.logsumexp(y_fake, axis=-1), -40.0, None)
        loss_real = jnp.clip(masked_mean(
            bce_logits(-e_real, jnp.ones_like(e_real))[..., None],
            batch.con_mask, axis=(1,)).mean(), None, 10.0)
        loss_fake = jnp.clip(masked_mean(
            bce_logits(-e_fake, jnp.zeros_like(e_fake))[..., None],
            batch.con_mask, axis=(1,)).mean(), None, 10.0)

        nan0 = lambda v: jnp.nan_to_num(v)  # noqa: E731
        losses = {"atom": nan0(loss_atom), "edge": nan0(loss_edge),
                  "real": nan0(loss_real), "fake": nan0(loss_fake),
                  "lig_focal": nan0(loss_lig_focal),
                  "rec_focal": nan0(loss_rec_focal),
                  "pos_from_lig": nan0(loss_pos_lig),
                  "pos_from_rec": nan0(loss_pos_rec)}
        results = {"type_true": batch.con_type_real, "type_pred": y_real,
                   "edge_true": batch.con_edge_type, "edge_pred": edge_pred,
                   "mask_gen": batch.con_mask}
        return losses, results

    def weighted_loss(self, loss_dict):
        w = dict(self.loss_weights)
        return sum(w.get(k, 1.0) * v for k, v in loss_dict.items())

    # ------------------------------------------------------------------
    # sampling-time heads (called from the host loop)
    # ------------------------------------------------------------------

    def sample_step(self, batch: P2MBatch, rng, temperature: float = 1.0):
        """One growth step per graph.

        Returns (new_pos [B,3], new_type [B], bond_types [B,NL],
                 focal_found [B]): the focal is the highest-logit frontier
        atom (ctx if any valid ctx atoms, else protein); position sampled
        from its MDN; element and bonds from the atom/edge head."""
        x, h, vec, mask, nl = self.encode(batch)
        h_lig, h_rec = h[:, :nl], h[:, nl:]
        vec_lig, vec_rec = vec[:, :nl], vec[:, nl:]
        k1, k2, k3 = jax.random.split(rng, 3)

        lig_logit = jnp.where(batch.ctx_mask & batch.ctx_frontier,
                              self.focal_logits(h_lig, vec_lig), -1e9)
        rec_logit = jnp.where(batch.rec_mask & batch.rec_pred_flag,
                              self.focal_logits(h_rec, vec_rec), -1e9)
        has_ctx = batch.ctx_mask.any(axis=1)
        use_lig = has_ctx
        best_lig = jnp.argmax(lig_logit, axis=1)
        best_rec = jnp.argmax(rec_logit, axis=1)
        best_logit = jnp.where(use_lig,
                               jnp.take_along_axis(lig_logit,
                                                   best_lig[:, None], 1)[:, 0],
                               jnp.take_along_axis(rec_logit,
                                                   best_rec[:, None], 1)[:, 0])
        focal_found = best_logit > 0.0    # sigmoid > 0.5

        def take(arr, idx):
            return gather_neighbors(arr.reshape(arr.shape[:2] + (-1,)),
                                    idx[:, None, None])[:, 0, 0].reshape(
                (arr.shape[0],) + arr.shape[2:])

        h_f = jnp.where(use_lig[:, None], take(h_lig, best_lig),
                        take(h_rec, best_rec))
        vec_f = jnp.where(use_lig[:, None, None],
                          take(vec_lig, best_lig), take(vec_rec, best_rec))
        x_f = jnp.where(use_lig[:, None], take(batch.ctx_pos, best_lig),
                        take(batch.rec_pos, best_rec))

        # multi-candidate expansion + log-prob filtering (reference:
        # pocket2mol.py:795-814 sample_position with sample_num=10 and
        # :716-792 filter_according_to_logprob): draw n_cand positions
        # from the MDN, classify element/bonds for ALL of them in one
        # batched head call, keep the highest mean-log-prob candidate
        # that clears the per-factor thresholds.
        n_cand = 10
        _, mu, sigma, pi = self.pos_pred(h_f, vec_f, x_f)
        cand_pos = PositionPredictor.sample(k1, mu, sigma, pi, n_cand)
        pdf_pos = PositionPredictor.mdn_probability(
            mu[:, None], sigma[:, None], pi[:, None], cand_pos)   # [B, NC]

        # classify element at each candidate + bonds to all ctx atoms
        nlc = batch.ctx_pos.shape[1]
        b = x.shape[0]
        edge_ctx_idx = jnp.broadcast_to(
            jnp.arange(nlc)[None, None],
            (b, n_cand, nlc)).astype(jnp.int32)
        edge_mask = jnp.broadcast_to(batch.ctx_mask[:, None, :],
                                     (b, n_cand, nlc))
        idx_row = edge_ctx_idx[:, :1]
        tri_rel = (gather_neighbors(batch.ctx_pos, idx_row)[..., :, None, :]
                   - gather_neighbors(batch.ctx_pos, idx_row)[..., None, :, :])
        tri_rel = jnp.broadcast_to(tri_rel, (b, n_cand, nlc, nlc, 3))
        lin = idx_row[..., :, None] * nlc + idx_row[..., None, :]
        flat = batch.ctx_bond.reshape(b, -1).astype(jnp.float32)
        onehot = jax.nn.one_hot(lin.reshape(b, -1), nlc * nlc)
        vals = jax.lax.dot_general(onehot, flat[..., None],
                                   (((2,), (1,)), ((0,), (0,))))[..., 0]
        tri_type = jnp.round(vals).astype(jnp.int32).reshape(b, 1, nlc, nlc)
        tri_type = jnp.where(jnp.eye(nlc, dtype=bool)[None, None], -1, tri_type)
        tri_feat = jax.nn.one_hot(tri_type, self.num_edge_classes)
        tri_feat = jnp.broadcast_to(
            tri_feat, (b, n_cand, nlc, nlc, self.num_edge_classes))

        y_cls, edge_pred = self.atom_edge_pred(
            x, h, vec, mask, cand_pos, jnp.ones((b, n_cand), bool),
            edge_ctx_idx=edge_ctx_idx, edge_mask=edge_mask,
            tri_rel=tri_rel, tri_feat=tri_feat)   # [B,NC,K], [B,NC,NL,E]
        new_type_c = jax.random.categorical(k2, y_cls / temperature)
        type_probs = jax.nn.softmax(y_cls, -1)
        p_type = jnp.take_along_axis(type_probs, new_type_c[..., None],
                                     -1)[..., 0]
        # p(an atom exists here) = sigmoid(logsumexp(logits))
        # (reference: pocket2mol.py:374)
        p_has_atom = jax.nn.sigmoid(
            jax.scipy.special.logsumexp(y_cls, axis=-1))
        bond_types_c = jnp.argmax(edge_pred, axis=-1)         # [B,NC,NL]
        bond_types_c = jnp.where(edge_mask, bond_types_c, 0)
        edge_probs = jax.nn.softmax(edge_pred, -1)
        p_bond = jnp.take_along_axis(edge_probs, bond_types_c[..., None],
                                     -1)[..., 0]
        best_bond_p = jnp.max(
            jnp.where((bond_types_c > 0) & edge_mask, p_bond, 0.0), axis=-1)
        p_focal = jax.nn.sigmoid(best_logit)[:, None]

        lg = lambda v: jnp.log(v + 1e-12)                     # noqa: E731
        score = (lg(pdf_pos) + lg(p_type) + lg(p_has_atom)
                 + lg(jnp.broadcast_to(p_focal, pdf_pos.shape))) / 4.0
        passed = ((lg(pdf_pos) > math.log(0.25))
                  & (lg(p_type) > math.log(0.3))
                  & (lg(p_has_atom) > math.log(0.6))
                  & (lg(p_focal) > math.log(0.5)))
        # bond gate only applies once a ligand context exists
        passed &= jnp.where(has_ctx[:, None],
                            lg(best_bond_p) > math.log(0.4), True)
        score_gated = jnp.where(passed, score, -jnp.inf)
        sel = jnp.where(passed.any(-1), jnp.argmax(score_gated, -1),
                        jnp.argmax(score, -1))                # [B]
        pick = lambda arr: jnp.take_along_axis(                # noqa: E731
            arr, sel.reshape((b,) + (1,) * (arr.ndim - 1)), 1)[:, 0]
        return (pick(cand_pos), pick(new_type_c), pick(bond_types_c),
                focal_found)


@MODELS.register("pocket2mol")
def _build_pocket2mol(cfg):
    return Pocket2Mol.from_config(cfg)


# ---------------------------------------------------------------------------
# host-side sampling loop
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model",))
def _jit_sample_step(model, params, batch, rng):
    return model.apply(params, batch, rng, method="sample_step")


@functools.partial(jax.jit, static_argnames=("model", "max_iter"))
def _jit_sample_scan(model, params, batch, rng, max_iter):
    """The full AR growth loop ON DEVICE: ``lax.scan`` over growth steps
    with per-graph active switches (the reference's end_switch concept,
    pocket2mol.py:265-266, as a carried bool mask). One device execution
    replaces max_iter x (1 dispatch + 4 fetch) host round-trips — on
    remote-dispatch platforms those round-trips dominate sampling wall
    time. The rng split sequence matches the host loop exactly, so both
    paths produce identical molecules (pinned by test).

    lax.scan, NOT lax.fori_loop: fori_loop bodies of this shape
    miscompile on the remote-TPU platform (see graphbp._jit_sample_scan
    for the measured evidence); scan is the verified construct."""
    nlc = batch.ctx_pos.shape[1]

    def body(carry, _):
        batch, active, rng = carry
        rng, step_key = jax.random.split(rng)
        new_pos, new_type, bond_types, focal_found = model.apply(
            params, batch, step_key, method="sample_step")
        slot = jnp.sum(batch.ctx_mask, 1)                      # [B]
        live = active & focal_found & (slot < nlc)
        upd = jax.nn.one_hot(slot, nlc, dtype=bool) & live[:, None]
        ctx_pos = jnp.where(upd[..., None], new_pos[:, None, :],
                            batch.ctx_pos)
        ctx_atype = jnp.where(upd, new_type[:, None], batch.ctx_atype)
        # bonds from the new slot to existing ctx atoms (old mask: j<slot)
        bt = jnp.where(batch.ctx_mask, bond_types, 0)          # [B, NL]
        add = jnp.where(upd[:, :, None], bt[:, None, :],
                        0).astype(batch.ctx_bond.dtype)
        ctx_bond = batch.ctx_bond + add + jnp.swapaxes(add, 1, 2)
        batch = batch.replace(
            ctx_pos=ctx_pos, ctx_atype=ctx_atype,
            ctx_mask=batch.ctx_mask | upd, ctx_bond=ctx_bond,
            ctx_frontier=batch.ctx_frontier | upd)
        return (batch, live, rng), ()

    init = (batch, jnp.ones(batch.batch_size, bool), rng)
    (out, _, _), _ = jax.lax.scan(body, init, None, length=max_iter)
    return {"pos": out.ctx_pos, "atype": out.ctx_atype,
            "mask": out.ctx_mask, "bond": out.ctx_bond}


def sample_pocket2mol(model: Pocket2Mol, params, batch: P2MBatch, rng,
                      max_iter: int = 30):
    """Grow molecules atom-by-atom in fixed-capacity buffers, fully
    on-device (see _jit_sample_scan). Returns padded results."""
    return _jit_sample_scan(model, params, batch, rng, max_iter)


def sample_pocket2mol_host(model: Pocket2Mol, params, batch: P2MBatch, rng,
                           max_iter: int = 30):
    """Host-stepped reference implementation of the growth loop (one
    device call per step, commits on host). Kept as the semantic
    reference for _jit_sample_scan's equality test."""
    import numpy as np

    b = batch.batch_size
    nlc = batch.ctx_pos.shape[1]
    active = np.ones(b, bool)
    for it in range(max_iter):
        rng, step_key = jax.random.split(rng)
        new_pos, new_type, bond_types, focal_found = _jit_sample_step(
            model, params, batch, step_key)
        new_pos = np.asarray(new_pos)
        new_type = np.asarray(new_type)
        bond_types = np.asarray(bond_types)
        focal_found = np.asarray(focal_found)
        active &= focal_found
        if not active.any():
            break
        ctx_pos = np.array(batch.ctx_pos)
        ctx_atype = np.array(batch.ctx_atype)
        ctx_mask = np.array(batch.ctx_mask)
        ctx_bond = np.array(batch.ctx_bond)
        frontier = np.array(batch.ctx_frontier)
        for g in range(b):
            if not active[g]:
                continue
            slot = int(ctx_mask[g].sum())
            if slot >= nlc:
                active[g] = False
                continue
            ctx_pos[g, slot] = new_pos[g]
            ctx_atype[g, slot] = new_type[g]
            ctx_mask[g, slot] = True
            frontier[g, slot] = True
            for j in range(slot):
                bt = int(bond_types[g, j]) if ctx_mask[g, j] else 0
                if bt > 0:
                    ctx_bond[g, slot, j] = bt
                    ctx_bond[g, j, slot] = bt
        batch = batch.replace(
            ctx_pos=jnp.asarray(ctx_pos), ctx_atype=jnp.asarray(ctx_atype),
            ctx_mask=jnp.asarray(ctx_mask), ctx_bond=jnp.asarray(ctx_bond),
            ctx_frontier=jnp.asarray(frontier))
    return {"pos": batch.ctx_pos, "atype": batch.ctx_atype,
            "mask": batch.ctx_mask, "bond": batch.ctx_bond}

"""FLAG training-sample builder (host-side numpy).

Rewrite of the reference bfs_motif_mask transform
(reference: repo/datasets/transforms/mask.py:262-447): decompose the ligand
into a motif tree, BFS-order it from the pocket-contacting motif, pick a
random prefix as context, and supervise (next motif class, attachment
site, focal flags, distance matrix to 4 reference protein atoms, torsion
frame). Candidate attachments are padded 2D graphs (current context +
next motif grafted at each frontier atom) scored by the GIN comb head.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..chem.mol import Molecule
from ..chem.moltree import MotifVocab, bfs_motif_order, tree_decomp


@struct.dataclass
class FLAGBatch:
    # protein
    rec_pos: jnp.ndarray          # [B, NR, 3]
    rec_element: jnp.ndarray      # [B, NR]
    rec_is_backbone: jnp.ndarray  # [B, NR]
    rec_aa: jnp.ndarray           # [B, NR]
    rec_mask: jnp.ndarray         # [B, NR]
    rec_contact: jnp.ndarray      # [B, NR]  contact labels (step 0)
    # alpha-carbon gather indices for the structure-refinement loss
    # (reference: utils/data.py sr_* index construction)
    ca_idx: jnp.ndarray           # [B, NA]  rec indices of CA atoms
    ca_mask: jnp.ndarray          # [B, NA]
    # ligand context (already-placed motif atoms)
    ctx_pos: jnp.ndarray          # [B, NL, 3]
    ctx_atype: jnp.ndarray        # [B, NL]
    ctx_mask: jnp.ndarray         # [B, NL]
    ctx_bond: jnp.ndarray         # [B, NL, NL]
    ctx_frontier: jnp.ndarray     # [B, NL]  attachment frontier labels
    # motif prediction
    focal_atoms: jnp.ndarray      # [B, NF]  ctx indices of current motif
    focal_mask: jnp.ndarray       # [B, NF]
    current_wid: jnp.ndarray      # [B]  (vocab.size() = start token)
    next_wid: jnp.ndarray         # [B]
    # candidate attachment graphs (2D): [B, NCAND, NA, NA] adjacency + types
    cand_atype: jnp.ndarray       # [B, NCAND, NA]
    cand_bond: jnp.ndarray        # [B, NCAND, NA, NA]
    cand_mask: jnp.ndarray        # [B, NCAND, NA]
    cand_valid: jnp.ndarray       # [B, NCAND]
    cand_labels: jnp.ndarray      # [B, NCAND]
    # distance-matrix supervision: new-motif atom <-> reference rec atoms
    dm_rec_idx: jnp.ndarray       # [B, ND]
    dm_new_atype: jnp.ndarray     # [B, ND]  atom types of new motif atoms
    dm_true: jnp.ndarray          # [B, ND]
    dm_mask: jnp.ndarray          # [B, ND]
    # torsion supervision around the graft bond (attach_ctx -> new anchor)
    tor_attach: jnp.ndarray       # [B] ctx index of the attachment atom
    tor_nbr: jnp.ndarray          # [B] ctx index of a neighbor of attach
    tor_new_atype: jnp.ndarray    # [B] type of the new anchor atom
    tor_true: jnp.ndarray         # [B] true dihedral (radians)
    tor_valid: jnp.ndarray        # [B]
    translation: jnp.ndarray      # [B, 3]

    @property
    def batch_size(self):
        return self.rec_pos.shape[0]


def mol_from_featurized(lig_d: dict) -> Molecule:
    """Rebuild a Molecule from featurized ligand arrays (atype class
    indices -> atomic numbers, bond_index/bond_type -> bonds)."""
    from ..constants.molecule import get_atomic_number_from_index
    z = np.array(get_atomic_number_from_index(lig_d["atype"], "basic")) \
        if lig_d["atype"].max() < 8 else lig_d["atype"]
    mol = Molecule(z, lig_d["pos"])
    bi, bt = lig_d.get("bond_index"), lig_d.get("bond_type")
    if bi is not None and bi.size:
        for k_ in range(bi.shape[1]):
            mol.add_bond(int(bi[0, k_]), int(bi[1, k_]), int(bt[k_]))
    return mol


def build_flag_sample(sample: dict, vocab: MotifVocab,
                      rng: np.random.Generator, num_cand: int = 8,
                      cand_atoms: int = 48, dm_cap: int = 32) -> Optional[dict]:
    lig_d, rec = sample["ligand"], sample["protein"]
    mol = mol_from_featurized(lig_d)

    cliques, edges = tree_decomp(mol)
    wids = [vocab.add(mol, c) for c in cliques]

    # start = clique closest to the protein
    d_gc = np.linalg.norm(lig_d["pos"][:, None] - rec["pos"][None], axis=-1)
    atom_min = d_gc.min(1)
    start = int(np.argmin([atom_min[c].min() for c in cliques]))
    order = bfs_motif_order(cliques, edges, start, rng)

    # random prefix as context (>=1 motif when possible)
    i = int(rng.integers(1, len(order))) if len(order) > 1 else 1
    prefix = order[:i]
    ctx_atoms = sorted(set(a for m in prefix for a in cliques[m]))
    next_clique = cliques[order[i]] if i < len(order) else cliques[order[-1]]
    next_wid = wids[order[i]] if i < len(order) else vocab.size()
    current_wid = wids[order[i - 1]]

    remap = {a: k for k, a in enumerate(ctx_atoms)}
    ctx_pos = lig_d["pos"][ctx_atoms]
    ctx_atype = lig_d["atype"][ctx_atoms]
    ctx_bond = np.zeros((len(ctx_atoms), len(ctx_atoms)), np.int8)
    for (a, b), cls in mol.bonds.items():
        if a in remap and b in remap:
            ctx_bond[remap[a], remap[b]] = cls
            ctx_bond[remap[b], remap[a]] = cls

    # frontier = ctx atoms bonded to atoms outside ctx
    frontier = np.zeros(len(ctx_atoms), bool)
    attach_atom = None
    for (a, b), cls in mol.bonds.items():
        if a in remap and b not in remap:
            frontier[remap[a]] = True
            if b in next_clique:
                attach_atom = remap[a]
        if b in remap and a not in remap:
            frontier[remap[b]] = True
            if a in next_clique:
                attach_atom = remap[b]

    focal_atoms = [remap[a] for a in cliques[order[i - 1]] if a in remap]

    # protein contact labels (within 4A of ligand)
    rec_contact = d_gc.min(0) < 4.0

    # candidate attachment graphs: graft next motif template at each
    # frontier atom; label the true attachment
    tmpl = vocab.templates.get(next_wid)
    cand_atype = np.zeros((num_cand, cand_atoms), np.int32)
    cand_bond = np.zeros((num_cand, cand_atoms, cand_atoms), np.int8)
    cand_mask = np.zeros((num_cand, cand_atoms), bool)
    cand_valid = np.zeros(num_cand, bool)
    cand_labels = np.zeros(num_cand, np.float32)
    if tmpl is not None and len(ctx_atoms) + len(tmpl["z"]) <= cand_atoms:
        sites = list(np.where(frontier)[0]) or list(range(len(ctx_atoms)))
        rng.shuffle(sites)
        if attach_atom is not None and attach_atom in sites:
            sites.remove(attach_atom)
            sites = [attach_atom] + sites
        from ..data.featurize import featurize_ligand
        t_atype = featurize_ligand(
            Molecule(tmpl["z"], tmpl["pos"]), "basic"
            if ctx_atype.max() < 8 else "add_aromatic",
            keep_bonds=False)["atype"]
        for c_i, site in enumerate(sites[:num_cand]):
            nctx, nt = len(ctx_atoms), len(tmpl["z"])
            cand_atype[c_i, :nctx] = ctx_atype
            cand_atype[c_i, nctx:nctx + nt] = t_atype
            cand_bond[c_i, :nctx, :nctx] = ctx_bond
            for (a, b), cls in tmpl["bonds"].items():
                cand_bond[c_i, nctx + a, nctx + b] = cls
                cand_bond[c_i, nctx + b, nctx + a] = cls
            cand_bond[c_i, site, nctx] = 1     # graft bond
            cand_bond[c_i, nctx, site] = 1
            cand_mask[c_i, :nctx + nt] = True
            cand_valid[c_i] = True
            cand_labels[c_i] = float(site == attach_atom)

    # distance-matrix supervision: new motif atoms <-> 4 nearest rec atoms
    dm_rec = np.zeros(dm_cap, np.int32)
    dm_atype = np.zeros(dm_cap, np.int32)
    dm_true = np.zeros(dm_cap, np.float32)
    dm_mask = np.zeros(dm_cap, bool)
    new_atoms = [a for a in next_clique if a not in remap]
    if new_atoms and attach_atom is not None:
        f_rec = np.argsort(np.linalg.norm(
            rec["pos"] - ctx_pos[attach_atom], axis=-1))[:4]
        k_ = 0
        for na in new_atoms:
            for rrr in f_rec:
                if k_ >= dm_cap:
                    break
                dm_rec[k_] = rrr
                dm_atype[k_] = lig_d["atype"][na]
                dm_true[k_] = np.linalg.norm(lig_d["pos"][na]
                                             - rec["pos"][rrr])
                dm_mask[k_] = True
                k_ += 1

    # torsion: dihedral (nbr, attach, new_anchor, new_second) in the true
    # ligand geometry
    tor = {"tor_attach": 0, "tor_nbr": 0, "tor_new_atype": 0,
           "tor_true": 0.0, "tor_valid": False}
    if attach_atom is not None and new_atoms:
        nbrs_ctx = [remap[b] if a in {k for k, v in remap.items()
                                      if v == attach_atom} else None
                    for (a, b) in []]
        # neighbors of attach inside ctx
        inv = {v: k for k, v in remap.items()}
        a_orig = inv[attach_atom]
        nbrs = [remap[x] for (p, q) in mol.bonds
                for x in ((q,) if p == a_orig else (p,) if q == a_orig else ())
                if x in remap]
        anchor = None
        for na in new_atoms:
            if (min(a_orig, na), max(a_orig, na)) in mol.bonds:
                anchor = na
                break
        second = None
        if anchor is not None:
            for (p, q) in mol.bonds:
                other = q if p == anchor else p if q == anchor else None
                if other is not None and other in new_atoms and other != anchor:
                    second = other
                    break
        if nbrs and anchor is not None and second is not None:
            from ..utils.geometry import dihedral_from_four_points
            import jax.numpy as _j
            d = float(dihedral_from_four_points(
                _j.asarray(ctx_pos[nbrs[0]]), _j.asarray(ctx_pos[attach_atom]),
                _j.asarray(lig_d["pos"][anchor]),
                _j.asarray(lig_d["pos"][second])))
            tor = {"tor_attach": attach_atom, "tor_nbr": nbrs[0],
                   "tor_new_atype": int(lig_d["atype"][anchor]),
                   "tor_true": d, "tor_valid": True}

    return {
        "protein": rec, "rec_contact": rec_contact, **tor,
        "ctx_pos": ctx_pos, "ctx_atype": ctx_atype, "ctx_bond": ctx_bond,
        "ctx_frontier": frontier, "focal_atoms": focal_atoms,
        "current_wid": current_wid, "next_wid": next_wid,
        "cand_atype": cand_atype, "cand_bond": cand_bond,
        "cand_mask": cand_mask, "cand_valid": cand_valid,
        "cand_labels": cand_labels,
        "dm_rec_idx": dm_rec, "dm_new_atype": dm_atype, "dm_true": dm_true,
        "dm_mask": dm_mask,
        "translation": sample.get("translation", np.zeros(3, np.float32)),
    }


REC_KEYS = ("rec_pos", "rec_element", "rec_is_backbone", "rec_aa",
            "rec_mask", "rec_contact", "ca_idx", "ca_mask")
CA_CAP = 96


def _alpha_indices(rec: dict) -> np.ndarray:
    """Indices of alpha carbons; pre-is_alpha caches (e.g. old shard
    pickles) fall back to backbone carbons."""
    from ..constants.protein import POCKET_ATOMIC_NUMBERS
    flag = rec.get("is_alpha")
    if flag is None:
        c_index = POCKET_ATOMIC_NUMBERS.index(6)
        flag = np.asarray(rec["is_backbone"], bool) & \
            (np.asarray(rec["element"]) == c_index)
    return np.where(np.asarray(flag, bool))[0]


def stack_flag_batch(samples, lig_cap=64, rec_cap=448, nf_cap=16,
                     rec_arrays=None) -> FLAGBatch:
    """rec_arrays: optional dict of the six pre-stacked REC_KEYS device
    arrays [B, rec_cap, ...]. The FLAG growth driver passes the same
    device-resident receptor block every round (it never changes within a
    pocket), skipping both the host restack and the host->device upload
    of the dominant ~[B,928] protein payload each predict round."""
    b = len(samples)
    nc, na = samples[0]["cand_atype"].shape
    nd = len(samples[0]["dm_true"])
    out = dict(
        rec_pos=np.zeros((b, rec_cap, 3), np.float32),
        rec_element=np.zeros((b, rec_cap), np.int32),
        rec_is_backbone=np.zeros((b, rec_cap), bool),
        rec_aa=np.zeros((b, rec_cap), np.int32),
        rec_mask=np.zeros((b, rec_cap), bool),
        rec_contact=np.zeros((b, rec_cap), bool),
        ca_idx=np.zeros((b, CA_CAP), np.int32),
        ca_mask=np.zeros((b, CA_CAP), bool),
        ctx_pos=np.zeros((b, lig_cap, 3), np.float32),
        ctx_atype=np.zeros((b, lig_cap), np.int32),
        ctx_mask=np.zeros((b, lig_cap), bool),
        ctx_bond=np.zeros((b, lig_cap, lig_cap), np.int8),
        ctx_frontier=np.zeros((b, lig_cap), bool),
        focal_atoms=np.zeros((b, nf_cap), np.int32),
        focal_mask=np.zeros((b, nf_cap), bool),
        current_wid=np.zeros(b, np.int32), next_wid=np.zeros(b, np.int32),
        cand_atype=np.zeros((b, nc, na), np.int32),
        cand_bond=np.zeros((b, nc, na, na), np.int8),
        cand_mask=np.zeros((b, nc, na), bool),
        cand_valid=np.zeros((b, nc), bool),
        cand_labels=np.zeros((b, nc), np.float32),
        dm_rec_idx=np.zeros((b, nd), np.int32),
        dm_new_atype=np.zeros((b, nd), np.int32),
        dm_true=np.zeros((b, nd), np.float32),
        dm_mask=np.zeros((b, nd), bool),
        tor_attach=np.zeros(b, np.int32), tor_nbr=np.zeros(b, np.int32),
        tor_new_atype=np.zeros(b, np.int32),
        tor_true=np.zeros(b, np.float32), tor_valid=np.zeros(b, bool),
        translation=np.zeros((b, 3), np.float32),
    )
    if rec_arrays is not None:
        for k in REC_KEYS:
            del out[k]
    for i, s in enumerate(samples):
        if rec_arrays is None:
            rec = s["protein"]
            nr = len(rec["pos"])
            out["rec_pos"][i, :nr] = rec["pos"]
            out["rec_element"][i, :nr] = rec["element"]
            out["rec_is_backbone"][i, :nr] = rec["is_backbone"]
            out["rec_aa"][i, :nr] = rec["aa"]
            out["rec_mask"][i, :nr] = True
            out["rec_contact"][i, :nr] = s["rec_contact"]
            ca = _alpha_indices(rec)
            ca = ca[ca < rec_cap][:CA_CAP]
            out["ca_idx"][i, :len(ca)] = ca
            out["ca_mask"][i, :len(ca)] = True
        nl = len(s["ctx_atype"])
        out["ctx_pos"][i, :nl] = s["ctx_pos"]
        out["ctx_atype"][i, :nl] = s["ctx_atype"]
        out["ctx_mask"][i, :nl] = True
        out["ctx_bond"][i, :nl, :nl] = s["ctx_bond"]
        out["ctx_frontier"][i, :nl] = s["ctx_frontier"]
        fa = s["focal_atoms"][:nf_cap]
        out["focal_atoms"][i, :len(fa)] = fa
        out["focal_mask"][i, :len(fa)] = True
        for k in ("current_wid", "next_wid", "cand_atype", "cand_bond",
                  "cand_mask", "cand_valid", "cand_labels", "dm_rec_idx",
                  "dm_new_atype", "dm_true", "dm_mask", "tor_attach",
                  "tor_nbr", "tor_new_atype", "tor_true", "tor_valid",
                  "translation"):
            out[k][i] = s[k]
    arrays = {k: jnp.asarray(v) for k, v in out.items()}
    if rec_arrays is not None:
        arrays.update(rec_arrays)
    return FLAGBatch(**arrays)

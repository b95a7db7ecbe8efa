"""FLAG autoregressive motif-growth sampling (host loop).

Rewrite of the reference sampler (reference: repo/models/autoregression/
flag.py:172-221 sample_init, :232-249 forward_attach, :251-389 sample):

  * init: pick the highest-scoring protein focal atom, predict the first
    motif from the start token, and place its template by classical MDS —
    embed the joint squared-distance matrix of [4 reference protein atoms
    | motif atoms] (protein block exact, cross block predicted by the
    dist head, motif block from the template geometry), then Kabsch-align
    the protein sub-coordinates onto their true positions and nudge the
    motif toward the pocket center (the reference's eig_coord_from_dist +
    kabsch_torch path, flag.py:192-211).
  * growth: sample a ligand focal atom from the focal head, predict the
    next motif (uniform over the top-5 classes, flag.py:111-115), graft
    its template at the comb-head's best frontier site, place the new
    atoms by the same MDS construction anchored near the attach atom, and
    rotate the new motif about the graft bond to the torsion head's angle.

Divergence by design: the reference re-embeds each fragment with RDKit +
UFF; here motif geometry comes from the data-harvested vocabulary
templates (chem/moltree.py), so no force field runs in the loop.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

from ..chem.mol import Molecule
from ..chem.moltree import MotifVocab, tree_decomp
from ..constants.molecule import get_atomic_number_from_index
from ..data.flag_data import build_flag_sample, stack_flag_batch


def eig_coord_from_dist(D: np.ndarray) -> np.ndarray:
    """Classical MDS: squared-distance matrix [n,n] -> coords [n,3]."""
    n = D.shape[0]
    J = np.eye(n) - 1.0 / n
    G = -0.5 * J @ D @ J
    w, v = np.linalg.eigh(G)
    idx = np.argsort(w)[::-1][:3]
    return v[:, idx] * np.sqrt(np.maximum(w[idx], 1e-9))


def kabsch_apply(P: np.ndarray, Q: np.ndarray, X: np.ndarray) -> np.ndarray:
    """Rigidly move X by the transform aligning P onto Q (least squares)."""
    pc, qc = P.mean(0), Q.mean(0)
    H = (P - pc).T @ (Q - qc)
    U, _S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    R = Vt.T @ np.diag([1.0, 1.0, d]) @ U.T
    return (X - pc) @ R.T + qc


def _sq_dist(x: np.ndarray) -> np.ndarray:
    d = x[:, None] - x[None]
    return np.sum(d * d, -1)


def _mds_place(ref_pos: np.ndarray, tmpl_pos: np.ndarray,
               d_cross: np.ndarray) -> np.ndarray:
    """Place template atoms given exact ref-ref and tmpl-tmpl distances and
    predicted ref-tmpl distances (reference: flag.py:204-209)."""
    nr = len(ref_pos)
    dm2 = d_cross ** 2                       # [nr, nt] squared
    top = np.concatenate([_sq_dist(ref_pos), dm2], axis=1)
    bot = np.concatenate([dm2.T, _sq_dist(tmpl_pos)], axis=1)
    coords = eig_coord_from_dist(np.concatenate([top, bot], axis=0))
    # MDS is chirality-blind: try the mirror too and keep whichever lets a
    # proper rotation align the reference block better
    best, best_err = None, np.inf
    for c in (coords, coords * np.array([1.0, 1.0, -1.0])):
        aligned_ref = kabsch_apply(c[:nr], ref_pos, c[:nr])
        err = float(np.sum((aligned_ref - ref_pos) ** 2))
        if err < best_err:
            best_err = err
            best = kabsch_apply(c[:nr], ref_pos, c[nr:])
    # rigid re-fit: the eigen-embedding distorts the template when the
    # predicted cross distances are non-Euclidean (early training); fit
    # the exact template geometry onto the embedded estimate so internal
    # bond lengths/angles are always preserved
    if len(tmpl_pos) >= 2:
        best = kabsch_apply(tmpl_pos, best, tmpl_pos)
    return best


def _rotate_about_axis(pos, a0, a1, angle):
    axis = a1 - a0
    n = np.linalg.norm(axis)
    if n < 1e-8:
        return pos
    k = axis / n
    v = pos - a0
    return (v * np.cos(angle)
            + np.cross(k, v) * np.sin(angle)
            + k[None] * (v @ k)[:, None] * (1 - np.cos(angle))) + a0


def _dihedral(p0, p1, p2, p3):
    b0, b1, b2 = p1 - p0, p2 - p1, p3 - p2
    b1n = b1 / max(np.linalg.norm(b1), 1e-8)
    v = b0 - (b0 @ b1n) * b1n
    w = b2 - (b2 @ b1n) * b1n
    return float(np.arctan2(np.cross(b1n, v) @ w, v @ w))


@functools.partial(__import__("jax").jit,
                   static_argnames=("model", "from_protein"))
def _jit_predict(model, params, batch, from_protein=False):
    return model.apply(params, batch, from_protein=from_protein,
                       method="predict_step")


@functools.partial(__import__("jax").jit,
                   static_argnames=("model", "from_protein"))
def _jit_predict_packed(model, params, batch, from_protein=False):
    """predict_step with the six heads packed into ONE [B, total] f32
    array. On remote-dispatch platforms every np.asarray is a separate
    device->host round trip; packing turns 6 fetches per growth round
    into 1 (measured: the fetch RPCs, not the forward, dominate the
    batched FLAG sampler's wall time)."""
    import jax.numpy as _jnp
    outs = model.apply(params, batch, from_protein=from_protein,
                       method="predict_step")
    flat = [o.astype(_jnp.float32) if o.ndim == 2
            else o[:, None].astype(_jnp.float32) for o in outs]
    return _jnp.concatenate(flat, axis=-1)


def _unpack_rows(packed, vocab_size, lig_cap, rec_cap, num_cand, dm_cap):
    """Split the packed [B, total] head array back into per-row lists of
    the six predict_step outputs (host side)."""
    dims = [vocab_size, lig_cap, rec_cap, num_cand, dm_cap, 1]
    splits = np.cumsum(dims)[:-1]
    parts = np.split(np.asarray(packed), splits, axis=-1)
    parts[-1] = parts[-1][:, 0]
    return [[p[r] for p in parts] for r in range(packed.shape[0])]


def _tmpl_pos(tmpl: dict, rng: np.random.Generator) -> np.ndarray:
    """One harvested instance geometry of a motif (falls back to the
    first-seen template). Sampling instances instead of repeating one
    geometry keeps per-type bond-length histograms at their empirical
    width (see MotifVocab.add)."""
    insts = tmpl.get("instances")
    if not insts or len(insts) == 1:
        return tmpl["pos"]
    return insts[int(rng.integers(0, len(insts)))]


def vocab_from_dataset(ds) -> MotifVocab:
    """Deterministic vocabulary: decompose every dataset ligand in index
    order (train and sample CLIs call this identically, so wids agree)."""
    from ..data.flag_data import mol_from_featurized
    vocab = MotifVocab()
    rng = np.random.default_rng(0)
    for i in range(len(ds)):
        try:
            s = ds.get(i, rng)
            mol = mol_from_featurized(s["ligand"])
        except Exception:
            continue
        cliques, _ = tree_decomp(mol)
        for c in cliques:
            vocab.add(mol, c)
    return vocab


class _GrowState:
    def __init__(self):
        self.pos = np.zeros((0, 3), np.float32)
        self.atype = np.zeros((0,), np.int32)
        self.bonds: dict = {}
        self.atom_to_motif: dict = {}
        self.motif_atoms: dict = {}
        self.motif_wid: dict = {}


def _make_sample(rec, st: _GrowState, focal_atoms, current_wid, cands,
                 dm, tor, num_cand, dm_cap):
    """One un-stacked predict-request sample (the driver stacks a list of
    these across concurrently growing molecules)."""
    n = len(st.atype)
    ctx_bond = np.zeros((n, n), np.int8)
    for (a, b), cls in st.bonds.items():
        ctx_bond[a, b] = ctx_bond[b, a] = cls
    return {
        "protein": rec,
        "rec_contact": np.zeros(len(rec["pos"]), bool),
        "ctx_pos": st.pos, "ctx_atype": st.atype, "ctx_bond": ctx_bond,
        "ctx_frontier": np.zeros(n, bool),
        "focal_atoms": list(focal_atoms), "current_wid": int(current_wid),
        "next_wid": 0,
        "cand_atype": cands[0], "cand_bond": cands[1],
        "cand_mask": cands[2], "cand_valid": cands[3],
        "cand_labels": np.zeros(num_cand, np.float32),
        "dm_rec_idx": dm[0], "dm_new_atype": dm[1],
        "dm_true": np.zeros(dm_cap, np.float32), "dm_mask": dm[2],
        "tor_attach": tor[0], "tor_nbr": tor[1], "tor_new_atype": tor[2],
        "tor_true": 0.0, "tor_valid": bool(tor[3]),
        "translation": np.zeros(3, np.float32),
    }


def _empty_cands(num_cand, cand_atoms):
    return (np.zeros((num_cand, cand_atoms), np.int32),
            np.zeros((num_cand, cand_atoms, cand_atoms), np.int8),
            np.zeros((num_cand, cand_atoms), bool),
            np.zeros(num_cand, bool))


def _build_cands(st: _GrowState, tmpl, sites, num_cand, cand_atoms,
                 featurize_mode):
    """Candidate 2D graphs grafting the template at each site — the same
    construction as training (data/flag_data.py:129-160)."""
    from ..data.featurize import featurize_ligand
    cands = _empty_cands(num_cand, cand_atoms)
    nctx, nt = len(st.atype), len(tmpl["z"])
    if nctx + nt > cand_atoms:
        return cands, []
    t_atype = featurize_ligand(Molecule(tmpl["z"], tmpl["pos"]),
                               featurize_mode, keep_bonds=False)["atype"]
    used = []
    for c_i, site in enumerate(sites[:num_cand]):
        cands[0][c_i, :nctx] = st.atype
        cands[0][c_i, nctx:nctx + nt] = t_atype
        for (a, b), cls in st.bonds.items():
            cands[1][c_i, a, b] = cands[1][c_i, b, a] = cls
        for (a, b), cls in tmpl["bonds"].items():
            cands[1][c_i, nctx + a, nctx + b] = cls
            cands[1][c_i, nctx + b, nctx + a] = cls
        cands[1][c_i, site, nctx] = 1
        cands[1][c_i, nctx, site] = 1
        cands[2][c_i, :nctx + nt] = True
        cands[3][c_i] = True
        used.append(site)
    return cands, used


def _free_valence_sites(st: _GrowState):
    from ..constants.molecule import MAX_VALENCE
    z = get_atomic_number_from_index(st.atype, "basic") \
        if st.atype.size and st.atype.max() < 8 else st.atype
    out = []
    for i in range(len(st.atype)):
        order = sum(min(cls, 3) for (a, b), cls in st.bonds.items()
                    if i in (a, b))
        if order < MAX_VALENCE.get(int(np.atleast_1d(z)[i]), 4):
            out.append(i)
    return out


def _top5_sample(logits: np.ndarray, vocab_n: int,
                 rng: np.random.Generator,
                 prior: Optional[np.ndarray] = None,
                 prior_alpha: float = 1.0) -> int:
    """Uniform draw from the top-5 classes (reference: flag.py:111-115).

    With ``prior`` (corpus motif frequencies, MotifVocab.counts), the
    top-5 draw is reweighted p_i ∝ softmax(logit_i) · prior_i^alpha —
    the VERDICT r4 #5 composition lever: the reference's uniform top-5
    flattens the learned distribution, under-selecting the ring motifs
    whose internal bonds saturate N/O valences (measured q4: generated
    HBD 4.98 vs the corpus 2.25, aromatic rings 1.1 vs 2.5 — the whole
    QED gap at matched element composition)."""
    logits = np.asarray(logits[:vocab_n], np.float64)
    top = np.argsort(logits)[::-1][:min(5, vocab_n)]
    if prior is None:
        return int(rng.choice(top))
    lg = logits[top] - logits[top].max()
    w = np.exp(lg) * np.power(np.maximum(prior[top], 1e-9), prior_alpha)
    w = w / w.sum()
    return int(rng.choice(top, p=w))


def _push_clear(pos: np.ndarray, rec_pos: np.ndarray, min_d: float,
                iters: int = 8) -> np.ndarray:
    """Rigidly translate a motif away from receptor atoms until its
    nearest receptor distance reaches min_d (bounded iterations; the
    template stays rigid so intra-motif geometry is untouched)."""
    pos = pos.copy()
    for _ in range(iters):
        d = np.linalg.norm(pos[:, None] - rec_pos[None], axis=-1)
        dmin = float(d.min())
        if dmin >= min_d:
            break
        # mean repulsion from all receptor atoms inside the shell
        ai, ri = np.nonzero(d < min_d + 0.5)
        vec = (pos[ai] - rec_pos[ri]).mean(0)
        nrm = float(np.linalg.norm(vec))
        if nrm < 1e-8:
            break
        pos = pos + vec / nrm * max(min_d - dmin, 0.3)
    return pos


def _flag_grow(base_sample: dict, vocab: MotifVocab, seed: int = 0,
               max_steps: int = 12, lig_cap: int = 64, num_cand: int = 8,
               cand_atoms: int = 48, dm_cap: int = 32,
               featurize_mode: str = "basic", steric: bool = True,
               motif_prior: Optional[np.ndarray] = None,
               prior_alpha: float = 1.0):
    """Coroutine growing ONE ligand. Yields predict requests
    ``(from_protein, sample_dict)`` and receives the 6 per-row head
    outputs of FLAG.predict_step; returns the final Molecule (or None)
    via StopIteration.value. Drivers batch requests from many concurrent
    coroutines into single device calls (sample_flag_batch) or serve them
    one-by-one (sample_flag) — the growth logic is identical either way."""
    rng = np.random.default_rng(seed)
    rec = base_sample["protein"]
    rec_pos = np.asarray(rec["pos"], np.float32)
    center = rec_pos.mean(0)
    vocab_n = vocab.size()
    st = _GrowState()

    def request(focal_atoms, wid, cands=None, dm=None, tor=None,
                from_protein=False):
        cands = cands if cands is not None else _empty_cands(num_cand,
                                                             cand_atoms)
        dm = dm if dm is not None else (np.zeros(dm_cap, np.int32),
                                        np.zeros(dm_cap, np.int32),
                                        np.zeros(dm_cap, bool))
        tor = tor if tor is not None else (0, 0, 0, False)
        return (from_protein,
                _make_sample(rec, st, focal_atoms, wid, cands, dm, tor,
                             num_cand, dm_cap))

    # ---- init (reference sample_init) --------------------------------
    ml, _lf, pf, *_ = yield request([], vocab_n, from_protein=False)
    focal_rec = int(np.argmax(pf))
    ml, *_ = yield request([focal_rec], vocab_n, from_protein=True)
    wid0 = _top5_sample(ml, vocab_n, rng, motif_prior, prior_alpha)
    tmpl = vocab.templates.get(wid0)
    if tmpl is None:
        return None

    ref_idx = np.argsort(np.linalg.norm(
        rec_pos - rec_pos[focal_rec], axis=-1))[:4]
    nt = len(tmpl["z"])
    from ..data.featurize import featurize_ligand
    t_atype = featurize_ligand(Molecule(tmpl["z"], tmpl["pos"]),
                               featurize_mode, keep_bonds=False)["atype"]
    dm_rec = np.zeros(dm_cap, np.int32)
    dm_at = np.zeros(dm_cap, np.int32)
    dm_mask = np.zeros(dm_cap, bool)
    k = 0
    for a in range(nt):
        for r in ref_idx:
            if k < dm_cap:
                dm_rec[k], dm_at[k], dm_mask[k] = r, t_atype[a], True
                k += 1
    _, _, _, _, pred_dm, _ = yield request(
        [focal_rec], vocab_n, dm=(dm_rec, dm_at, dm_mask),
        from_protein=True)
    d_cross = np.zeros((4, nt), np.float32)
    k = 0
    for a in range(nt):
        for j in range(4):
            if k < dm_cap:
                d_cross[j, a] = max(pred_dm[k], 1.0)
                k += 1
    new_pos = _mds_place(rec_pos[ref_idx], _tmpl_pos(tmpl, rng),
                         d_cross)
    new_pos = new_pos + (center - new_pos.mean(0)) * 0.8  # flag.py:210-211
    if steric:
        # the 0.8-centering can bury the seed motif inside the receptor
        # (measured r3: nearest-protein 0.85 A vs the crystal's 2.97);
        # push it rigidly out past the evaluator's clash band before
        # growth starts (vdW sum - 0.4 tolerance = 3.0 A for C-C, 3.2
        # for S/P pairs, tools/geometry.py detect_clash — the first q4
        # run pushed to 2.4 and survivors still read 99.6% clashed)
        new_pos = _push_clear(new_pos, rec_pos, min_d=3.25)

    st.pos = new_pos.astype(np.float32)
    st.atype = np.asarray(t_atype, np.int32)
    st.bonds = dict(tmpl["bonds"])
    st.motif_atoms[0] = list(range(nt))
    st.motif_wid[0] = wid0
    for a in range(nt):
        st.atom_to_motif[a] = 0

    # ---- growth loop (reference sample, flag.py:251-389) -------------
    for step in range(1, max_steps):
        sites_all = _free_valence_sites(st)
        if not sites_all:
            break
        _, lf, _pf, *_ = yield request([], vocab_n)
        scores = np.exp(lf[:len(st.atype)]
                        - np.max(lf[:len(st.atype)]))
        allowed = np.zeros(len(st.atype))
        allowed[sites_all] = scores[sites_all]
        if allowed.sum() <= 0:
            break
        focal_atom = int(rng.choice(len(st.atype), p=allowed / allowed.sum()))
        motif_id = st.atom_to_motif[focal_atom]
        focal_atoms = st.motif_atoms[motif_id]
        cur_wid = st.motif_wid[motif_id]

        ml, *_ = yield request(focal_atoms, cur_wid)
        # mask out motifs whose graft atom has no free valence
        ml = np.array(ml, np.float64)
        for w in range(vocab_n):
            t = vocab.templates.get(w)
            if t is None or t.get("graft_free_valence", 1) <= 0:
                ml[w] = -np.inf
        if not np.isfinite(ml[:vocab_n]).any():
            break
        next_wid = _top5_sample(ml, vocab_n, rng, motif_prior,
                                prior_alpha)
        tmpl = vocab.templates.get(next_wid)
        if tmpl is None:
            break
        nt = len(tmpl["z"])
        nctx = len(st.atype)
        if nctx + nt > min(lig_cap, cand_atoms):
            break

        # candidate sites: free-valence atoms of the focal motif first,
        # then any free-valence atom
        sites = [s for s in sites_all if s in focal_atoms] or sites_all
        cands, used = _build_cands(st, tmpl, sites, num_cand, cand_atoms,
                                   featurize_mode)
        if not used:
            break
        _, _, _, comb, *_ = yield request(focal_atoms, cur_wid, cands=cands)
        comb_logits = np.asarray(comb[:len(used)], np.float64).copy()
        if steric:
            # protein-aware attachment (VERDICT r3 #4): the comb head is
            # receptor-blind, so sites whose outward growth direction
            # points into the protein score the same as open ones. Probe
            # ~one bond length past each site along its outward direction
            # and penalize receptor-crowded placements in logit space.
            lig_centroid = st.pos.mean(0)
            for ci, u in enumerate(used):
                out_dir = st.pos[u] - lig_centroid
                nrm = float(np.linalg.norm(out_dir))
                out_dir = (out_dir / nrm if nrm > 1e-6
                           else rng.normal(size=3))
                probe = st.pos[u] + 2.0 * out_dir
                rec_d = float(np.linalg.norm(rec_pos - probe,
                                             axis=-1).min())
                site_d = float(np.linalg.norm(rec_pos - st.pos[u],
                                              axis=-1).min())
                comb_logits[ci] -= 2.0 * (max(0.0, 2.5 - rec_d)
                                          + max(0.0, 1.7 - site_d))
        attach = used[int(np.argmax(comb_logits))]

        # place new atoms: MDS against 4 rec refs nearest the attach atom
        ref_idx = np.argsort(np.linalg.norm(
            rec_pos - st.pos[attach], axis=-1))[:4]
        t_atype = featurize_ligand(Molecule(tmpl["z"], tmpl["pos"]),
                                   featurize_mode,
                                   keep_bonds=False)["atype"]
        dm_rec = np.zeros(dm_cap, np.int32)
        dm_at = np.zeros(dm_cap, np.int32)
        dm_mask = np.zeros(dm_cap, bool)
        k = 0
        for a in range(nt):
            for r in ref_idx:
                if k < dm_cap:
                    dm_rec[k], dm_at[k], dm_mask[k] = r, t_atype[a], True
                    k += 1
        nbrs = [b if a == focal_atom else a
                for (a, b) in st.bonds if focal_atom in (a, b)]
        tor_nbr = nbrs[0] if nbrs else attach
        _, _, _, _, pred_dm, pred_alpha = yield request(
            focal_atoms, cur_wid, dm=(dm_rec, dm_at, dm_mask),
            tor=(attach, tor_nbr, int(t_atype[0]), True))
        d_cross = np.zeros((4, nt), np.float32)
        k = 0
        for a in range(nt):
            for j in range(4):
                if k < dm_cap:
                    d_cross[j, a] = max(pred_dm[k], 1.0)
                    k += 1
        new_pos = _mds_place(rec_pos[ref_idx], _tmpl_pos(tmpl, rng),
                             d_cross)
        # enforce the graft-bond length toward the attach atom
        d0 = new_pos[0] - st.pos[attach]
        n0 = np.linalg.norm(d0)
        if n0 < 1e-6:
            d0, n0 = rng.normal(size=3), 1.0
            n0 = np.linalg.norm(d0)
        new_pos = new_pos + (st.pos[attach] + d0 / n0 * 1.5 - new_pos[0])

        # torsion about the graft bond (reference: flag.py:350-376)
        if nt > 1 and tor_nbr != attach:
            cur = _dihedral(st.pos[tor_nbr], st.pos[attach],
                            new_pos[0], new_pos[1])
            new_pos[1:] = _rotate_about_axis(
                new_pos[1:], st.pos[attach], new_pos[0],
                float(pred_alpha) - cur)

        # steric guard (the reference relies on UFF relaxation for this,
        # flag.py:161-170): if any new atom clashes with the context,
        # scan graft-bond directions x torsions (both bond-preserving,
        # template stays rigid) and keep the clearest placement.
        def _clearance(np_):
            d = np.linalg.norm(np_[:, None] - st.pos[None], axis=-1)
            d[0, attach] = np.inf          # the graft bond itself
            lig_c = float(d.min())
            if steric:
                # receptor clearance on the same scale: 3.25 A to the
                # protein counts like 1.0 A to the ligand — below 3.25
                # the evaluator's vdW criterion reads a clash (the
                # earlier 2.0 A equivalence point left placements inside
                # the clash band)
                rec_c = float(np.linalg.norm(
                    np_[:, None] - rec_pos[None], axis=-1).min())
                return min(lig_c, rec_c - 2.25)
            return lig_c

        def _reorient(np_, new_dir):
            """Rigidly rotate the motif about the attach atom so the graft
            bond points along new_dir."""
            v0 = np_[0] - st.pos[attach]
            v0 = v0 / max(np.linalg.norm(v0), 1e-8)
            axis = np.cross(v0, new_dir)
            s = np.linalg.norm(axis)
            if s < 1e-8:
                return np_ if (v0 @ new_dir) > 0 else \
                    st.pos[attach] - (np_ - st.pos[attach])
            ang = float(np.arctan2(s, v0 @ new_dir))
            return _rotate_about_axis(np_, st.pos[attach], st.pos[attach]
                                      + axis / s, ang)

        if _clearance(new_pos) < 1.0:
            crowd = st.pos[np.linalg.norm(st.pos - st.pos[attach],
                                          axis=-1) < 4.0]
            if steric:
                rec_crowd = rec_pos[np.linalg.norm(
                    rec_pos - st.pos[attach], axis=-1) < 4.0]
                if len(rec_crowd):
                    crowd = np.concatenate([crowd, rec_crowd])
            away = st.pos[attach] - crowd.mean(0)
            away = away / max(np.linalg.norm(away), 1e-8)
            dirs = [d0 / n0, away] + [rng.normal(size=3) for _ in range(6)]
            best_np, best_c = new_pos, _clearance(new_pos)
            for dv in dirs:
                dv = np.asarray(dv, np.float64)
                dv = dv / max(np.linalg.norm(dv), 1e-8)
                cand0 = _reorient(new_pos, dv)
                for frac in range(12):
                    cand_np = cand0.copy()
                    if nt > 1:
                        cand_np[1:] = _rotate_about_axis(
                            cand_np[1:], st.pos[attach], cand_np[0],
                            2 * np.pi * frac / 12)
                    c = _clearance(cand_np)
                    if c > best_c:
                        best_np, best_c = cand_np, c
                    if nt == 1:
                        break
                if best_c >= 1.2:
                    break
            new_pos = best_np

        # commit
        base = len(st.atype)
        st.pos = np.concatenate([st.pos, new_pos.astype(np.float32)])
        st.atype = np.concatenate([st.atype,
                                   np.asarray(t_atype, np.int32)])
        for (a, b), cls in tmpl["bonds"].items():
            st.bonds[(base + a, base + b)] = cls
        st.bonds[(attach, base)] = 1
        st.motif_atoms[step] = list(range(base, base + nt))
        st.motif_wid[step] = next_wid
        for a in range(base, base + nt):
            st.atom_to_motif[a] = step

    if len(st.atype) == 0:
        return None
    z = np.asarray(get_atomic_number_from_index(st.atype, "basic")
                   if st.atype.max() < 8 else st.atype)
    mol = Molecule(z, st.pos.astype(np.float64))
    for (a, b), cls in st.bonds.items():
        mol.add_bond(int(a), int(b), int(min(cls, 3)))
    return mol


def _predict_rows(model, params, samples, from_protein, lig_cap, rec_cap,
                  b_cap, num_cand=8, dm_cap=32, cache=None):
    """One jitted predict over a list of request samples, padded to b_cap
    rows (a fixed batch shape = one compile per from_protein value); one
    packed device->host fetch for all six heads. cache (a dict owned by
    the calling driver) keeps the stacked receptor block device-resident
    across rounds — all rows share one pocket, so it never changes."""
    from ..data.flag_data import REC_KEYS

    pad = samples + [samples[0]] * (b_cap - len(samples))
    rec_arrays = cache.get("rec") if cache is not None else None
    batch = stack_flag_batch(pad, lig_cap=lig_cap, rec_cap=rec_cap,
                             rec_arrays=rec_arrays)
    if cache is not None and rec_arrays is None:
        cache["rec"] = {k: getattr(batch, k) for k in REC_KEYS}
    packed = _jit_predict_packed(model, params, batch,
                                 from_protein=from_protein)
    return _unpack_rows(packed, model.vocab_size, lig_cap, rec_cap,
                        num_cand, dm_cap)[:len(samples)]


@functools.partial(__import__("jax").jit,
                   static_argnames=("model", "clash_push"))
def _jit_refine(model, params, batch, clash_push=0.0):
    return model.apply(params, batch, clash_push, method="refine_step")


def _refine_molecules(model, params, base_sample, mols, lig_cap, rec_cap,
                      refine_iters, featurize_mode, num_cand, cand_atoms,
                      dm_cap, clash_push=0.0):
    """Apply the trained sr force heads to grown poses (EXTENSION: the
    reference trains refine_protein/refine_ligand but never applies them
    at sampling). One jitted program refines the whole batch per
    iteration."""
    from ..data.featurize import featurize_ligand
    rec = base_sample["protein"]
    idxs = [i for i, m in enumerate(mols)
            if m is not None and m.num_atoms <= lig_cap]
    if not idxs:
        return mols
    samples = []
    for i in idxs:
        st = _GrowState()
        m = mols[i]
        st.pos = np.asarray(m.pos, np.float32)
        st.atype = np.asarray(
            featurize_ligand(m, featurize_mode, keep_bonds=False)["atype"],
            np.int32)
        st.bonds = dict(m.bonds)
        samples.append(_make_sample(
            rec, st, [], 0,
            _empty_cands(num_cand, cand_atoms),
            (np.zeros(dm_cap, np.int32), np.zeros(dm_cap, np.int32),
             np.zeros(dm_cap, bool)), (0, 0, 0, False), num_cand, dm_cap))
    from ..data.flag_data import stack_flag_batch
    batch = stack_flag_batch(samples, lig_cap=lig_cap, rec_cap=rec_cap)
    for _ in range(refine_iters):
        new_pos = _jit_refine(model, params, batch, clash_push=clash_push)
        batch = batch.replace(ctx_pos=new_pos)
    pos = np.asarray(batch.ctx_pos)
    out = list(mols)
    for row, i in enumerate(idxs):
        m = mols[i]
        out[i] = Molecule(m.atomic_numbers, pos[row, :m.num_atoms].copy(),
                          bonds=dict(m.bonds), aromatic=m.aromatic,
                          name=m.name)
    return out


def sample_flag_batch(model, params, base_sample: dict, vocab: MotifVocab,
                      seeds, max_steps: int = 12, lig_cap: int = 64,
                      rec_cap: int = 448, num_cand: int = 8,
                      cand_atoms: int = 48, dm_cap: int = 32,
                      featurize_mode: str = "basic", refine_iters: int = 0,
                      refine_clash: float = 0.0, steric: bool = True,
                      motif_prior_alpha: float = 0.0):
    """Grow len(seeds) ligands concurrently in the same pocket.

    Lockstep driver over per-molecule coroutines: each round collects one
    pending predict request from every still-growing molecule and serves
    them with ONE device call per from_protein group. On remote-dispatch
    platforms this is the difference between ~48 device round-trips per
    molecule and ~48 per *batch* (measured 16x at batch 16 on v5e).
    Returns a list of Optional[Molecule], aligned with seeds."""
    gens, live, results = [], {}, [None] * len(seeds)
    cache: dict = {}
    for i, s in enumerate(seeds):
        prior = None
        if motif_prior_alpha > 0 and getattr(vocab, 'counts', None):
            prior = np.zeros(vocab.size())
            for wid, c in vocab.counts.items():
                prior[wid] = c
            prior /= max(prior.sum(), 1e-9)
        g = _flag_grow(base_sample, vocab, seed=s, max_steps=max_steps,
                       lig_cap=lig_cap, num_cand=num_cand,
                       cand_atoms=cand_atoms, dm_cap=dm_cap,
                       featurize_mode=featurize_mode, steric=steric,
                       motif_prior=prior, prior_alpha=motif_prior_alpha)
        gens.append(g)
        try:
            live[i] = g.send(None)
        except StopIteration as e:
            results[i] = e.value
    b_cap = max(len(seeds), 1)
    while live:
        for flag in (False, True):
            idxs = [i for i in sorted(live) if live[i][0] is flag]
            if not idxs:
                continue
            rows = _predict_rows(model, params, [live[i][1] for i in idxs],
                                 flag, lig_cap, rec_cap, b_cap,
                                 num_cand=num_cand, dm_cap=dm_cap,
                                 cache=cache)
            for i, row in zip(idxs, rows):
                try:
                    live[i] = gens[i].send(row)
                except StopIteration as e:
                    results[i] = e.value
                    del live[i]
    if refine_iters > 0:
        results = _refine_molecules(model, params, base_sample, results,
                                    lig_cap, rec_cap, refine_iters,
                                    featurize_mode, num_cand, cand_atoms,
                                    dm_cap, clash_push=refine_clash)
    return results


def sample_flag(model, params, base_sample: dict, vocab: MotifVocab,
                seed: int = 0, max_steps: int = 12, lig_cap: int = 64,
                rec_cap: int = 448, num_cand: int = 8, cand_atoms: int = 48,
                dm_cap: int = 32,
                featurize_mode: str = "basic") -> Optional[Molecule]:
    """Grow one ligand in the given pocket (single-molecule driver over
    the _flag_grow coroutine). Returns a Molecule or None."""
    return sample_flag_batch(
        model, params, base_sample, vocab, [seed], max_steps=max_steps,
        lig_cap=lig_cap, rec_cap=rec_cap, num_cand=num_cand,
        cand_atoms=cand_atoms, dm_cap=dm_cap,
        featurize_mode=featurize_mode)[0]

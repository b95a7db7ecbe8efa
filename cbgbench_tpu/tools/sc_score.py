"""Shape-and-color (SC) similarity scoring + 3D fragment-to-molecule
atom mapping for the fragment/linker tasks.

Reference behavior: repo/datasets/parsers/frag.py:705-785 —
`calc_SC_RDKit_score` = 0.5 * pharmacophore FeatureMap score
+ 0.5 * (1 - ShapeProtrudeDist), and `get_atom_map_3d` /
`find_anchor_indices_3d` (epsilon = 0.01 Å coordinate matching).

When RDKit is available the exact FeatMaps/ShapeProtrudeDist path runs;
otherwise a geometric analogue scores the same two components:
  * feature score — Gaussian-kernel matching of typed pharmacophore
    points (donor, acceptor, aromatic centroid, hydrophobe)
  * shape score — 1 - protrusion, protrusion measured per query atom as
    the clipped distance beyond the reference's van-der-Waals surface
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..chem.mol import Molecule
from ..chem.rdkit_bridge import HAS_RDKIT

VDW = {1: 1.2, 6: 1.7, 7: 1.55, 8: 1.52, 9: 1.47, 15: 1.8, 16: 1.8,
       17: 1.75, 35: 1.85, 53: 1.98}


def _features(mol: Molecule) -> List[Tuple[str, np.ndarray]]:
    """Typed pharmacophore points (family, position)."""
    feats = []
    adj = mol.neighbors()
    for i, z in enumerate(mol.atomic_numbers):
        z = int(z)
        if z in (7, 8):
            feats.append(("Acceptor", mol.pos[i]))
            # heavy-atom-only representation: any N/O with spare valence is
            # a potential donor
            if mol.bond_valence(i) < {7: 3, 8: 2}.get(z, 2):
                feats.append(("Donor", mol.pos[i]))
        elif z == 6 and len(adj[i]) and all(
                int(mol.atomic_numbers[j]) in (6, 1) for j in adj[i]):
            feats.append(("Hydrophobe", mol.pos[i]))
    arom = (np.asarray(mol.aromatic, bool) if mol.aromatic is not None
            else np.zeros(mol.num_atoms, bool))
    for ring in mol.rings():
        if len(ring) in (5, 6) and arom[ring].mean() >= 0.5:
            feats.append(("Aromatic", mol.pos[ring].mean(0)))
    return feats


def feature_map_score(query: Molecule, ref: Molecule,
                      sigma: float = 1.0) -> float:
    """Best-match Gaussian scoring of same-family feature pairs,
    normalized like FeatMaps.ScoreFeats(mode=Best) (frag.py:705-746)."""
    fq, fr = _features(query), _features(ref)
    if not fq or not fr:
        return 0.0
    score = 0.0
    for fam_r, p_r in fr:
        best = 0.0
        for fam_q, p_q in fq:
            if fam_q != fam_r:
                continue
            d2 = float(((p_q - p_r) ** 2).sum())
            best = max(best, np.exp(-d2 / (2 * sigma ** 2)))
        score += best
    return score / min(len(fr), len(fq))


def shape_protrude_dist(query: Molecule, ref: Molecule) -> float:
    """Fraction of the query sticking out of the reference's vdW envelope
    (geometric analogue of rdShapeHelpers.ShapeProtrudeDist)."""
    if query.num_atoms == 0 or ref.num_atoms == 0:
        return 1.0
    d = np.linalg.norm(query.pos[:, None] - ref.pos[None], axis=-1)
    r_ref = np.array([VDW.get(int(z), 1.7) for z in ref.atomic_numbers])
    r_q = np.array([VDW.get(int(z), 1.7) for z in query.atomic_numbers])
    # per query atom: how far its sphere pokes beyond the nearest ref sphere
    gap = d - r_ref[None]
    nearest = gap.min(axis=1)
    protrusion = np.clip(nearest + r_q, 0.0, 2 * r_q) / (2 * r_q)
    return float(protrusion.mean())


def calc_sc_score(query: Molecule, ref: Molecule) -> float:
    """SC score in [0, 1]: 0.5 * feature score + 0.5 * (1 - protrusion)
    (reference: frag.py:748-757 calc_SC_RDKit_score)."""
    if HAS_RDKIT:
        try:
            return _calc_sc_score_rdkit(query, ref)
        except Exception:
            pass
    fm = feature_map_score(query, ref)
    pr = shape_protrude_dist(query, ref)
    return 0.5 * fm + 0.5 * (1.0 - pr)


def _calc_sc_score_rdkit(query: Molecule, ref: Molecule) -> float:
    """Exact reference path (RDKit FeatMaps + ShapeProtrudeDist)."""
    from rdkit.Chem import AllChem, rdShapeHelpers
    from rdkit.Chem.FeatMaps import FeatMaps
    from rdkit import RDConfig
    import os

    from ..chem.rdkit_bridge import to_rdkit
    q, r = to_rdkit(query, sanitize=True), to_rdkit(ref, sanitize=True)
    fdef = AllChem.BuildFeatureFactory(
        os.path.join(RDConfig.RDDataDir, "BaseFeatures.fdef"))
    fm_params = {k: FeatMaps.FeatMapParams()
                 for k in fdef.GetFeatureFamilies()}
    keep = ("Donor", "Acceptor", "NegIonizable", "PosIonizable",
            "ZnBinder", "Aromatic", "Hydrophobe", "LumpedHydrophobe")
    feat_lists = [[f for f in fdef.GetFeaturesForMol(m)
                   if f.GetFamily() in keep] for m in (r, q)]
    fm = FeatMaps.FeatMap(feats=feat_lists[0],
                          weights=[1] * len(feat_lists[0]),
                          params=fm_params)
    fm.scoreMode = FeatMaps.FeatMapScoreMode.Best
    fm_score = fm.ScoreFeats(feat_lists[1]) / min(fm.GetNumFeatures(),
                                                  len(feat_lists[1]))
    protrude = rdShapeHelpers.ShapeProtrudeDist(q, r, allowReordering=False)
    return 0.5 * fm_score + 0.5 * (1 - protrude)


# ---------------------------------------------------------------------------
# 3D coordinate transfer (fragment <-> parent molecule mapping)
# ---------------------------------------------------------------------------

def get_atom_map_3d(mol: Molecule, frag: Molecule,
                    epsilon: float = 0.01) -> List[Tuple[int, int]]:
    """(frag_idx, mol_idx) pairs whose coordinates coincide within epsilon
    (reference: frag.py:760-785)."""
    if frag.num_atoms == 0 or mol.num_atoms == 0:
        return []
    d = np.linalg.norm(frag.pos[:, None] - mol.pos[None], axis=-1)
    fi, mi = np.nonzero(d < epsilon)
    return list(zip(fi.tolist(), mi.tolist()))


def find_anchor_indices_3d(mol: Molecule, frag: Molecule,
                           epsilon: float = 0.01
                           ) -> Dict[str, List[int]]:
    """Anchor atoms: mapped atoms bonded (in the parent molecule) to an
    unmapped atom — the attachment points of the fragment
    (reference: frag.py:787-820 find_anchor_indices_3d)."""
    mapping = dict(get_atom_map_3d(mol, frag, epsilon))
    mol_to_frag = {m: f for f, m in mapping.items()}
    anchors_frag, anchors_mol = set(), set()
    for (i, j) in mol.bonds:
        for a, b in ((i, j), (j, i)):
            if a in mol_to_frag and b not in mol_to_frag:
                anchors_mol.add(a)
                anchors_frag.add(mol_to_frag[a])
    return {"frag": sorted(anchors_frag), "mol": sorted(anchors_mol)}


def transfer_coords(frag: Molecule, mol: Molecule,
                    epsilon: float = 0.01) -> Molecule:
    """Copy parent-molecule coordinates onto matching fragment atoms — the
    3D coordinate-transfer step of the fragment pipelines
    (reference: frag.py get_atom_map_3d consumers)."""
    out = frag.extract(list(range(frag.num_atoms)))
    for f, m in get_atom_map_3d(mol, frag, epsilon):
        out.pos[f] = mol.pos[m]
    return out

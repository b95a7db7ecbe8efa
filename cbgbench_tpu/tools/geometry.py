"""Geometry evaluation: bond-length/angle JSD vs CrossDocked empirical
distributions, molecule/atom stability, steric clash.

Numpy port of the reference evaluators (reference: repo/tools/geometry/
eval_bond_length.py, eval_bond_angle.py, eval_stability.py:9-177,
eval_steric_clash.py:56-135). The empirical reference histograms ship in
assets/geometry/*.npy (same files the reference uses).
"""

from __future__ import annotations

import collections
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy.spatial.distance import jensenshannon

from ..chem.mol import Molecule
from ..utils.geometry import angle_from_three_points  # noqa: F401 (jnp ver)

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                          "geometry")

DISTANCE_BINS = np.arange(1.1, 1.7, 0.005)[:-1]
ANGLE_BINS = np.arange(0, 180, 2)
PAIR_BINS = {"CC_2A": np.linspace(0, 2, 100), "All_12A": np.linspace(0, 12, 100)}


def _load(name):
    return np.load(os.path.join(_ASSET_DIR, name), allow_pickle=True).tolist()


def ref_length_distributions() -> dict:
    return _load("_ref_length_distribution.npy")


def ref_angle_distributions() -> dict:
    return _load("_ref_angle_distribution.npy")


def ref_pairdist_distributions() -> dict:
    return _load("_ref_pairdist_distribution.npy")


def get_distribution(values: Sequence[float], bins) -> np.ndarray:
    counts = collections.Counter(np.searchsorted(bins, values))
    counts = [counts.get(i, 0) for i in range(len(bins) + 1)]
    arr = np.array(counts, float)
    return arr / max(arr.sum(), 1)


# ---------------------------------------------------------------------------
# bond lengths
# ---------------------------------------------------------------------------

def _aromatic_ring_bonds(mol: Molecule) -> set:
    """Bond keys inside perceived-aromatic rings. The reference keys its
    histograms from RDKit bond types, where aromatic ring bonds are a
    separate class (4) — SDFs here (like CrossDocked's) are kekulized,
    so without this re-keying every aromatic C:C (~1.39 Å) lands in the
    SINGLE-bond histogram whose reference mass sits at ~1.52 Å, inflating
    JSD_BL for every ring-bearing molecule."""
    if mol.aromatic is None or not mol.aromatic.any():
        return set()
    keys = set()
    for ring in mol.rings():
        if not all(mol.aromatic[a] for a in ring):
            continue
        m = len(ring)
        for a in range(m):
            i, j = ring[a], ring[(a + 1) % m]
            if (min(i, j), max(i, j)) in mol.bonds:
                keys.add((min(i, j), max(i, j)))
    return keys


def mol_bond_lengths(mol: Molecule) -> List[Tuple[Tuple[int, int, int], float]]:
    arom = _aromatic_ring_bonds(mol)
    out = []
    for (i, j), cls in mol.bonds.items():
        z1, z2 = int(mol.atomic_numbers[i]), int(mol.atomic_numbers[j])
        if z1 > z2:
            z1, z2 = z2, z1
        d = float(np.linalg.norm(mol.pos[i] - mol.pos[j]))
        key_cls = 4 if (i, j) in arom or (j, i) in arom else int(cls)
        out.append(((z1, z2, key_cls), d))
    return out


def bond_length_profile(mols: Sequence[Molecule]) -> Dict:
    prof = collections.defaultdict(list)
    for m in mols:
        for bt, d in mol_bond_lengths(m):
            prof[bt].append(d)
    return {k: get_distribution(v, DISTANCE_BINS) for k, v in prof.items()}


def eval_bond_length_jsd(mols: Sequence[Molecule]) -> Dict[str, Optional[float]]:
    """JSD per tracked bond type (reference: eval_bond_length.py:62-76)."""
    prof = bond_length_profile(mols)
    ref = ref_length_distributions()
    sym = {1: "-", 2: "=", 3: "#", 4: ":"}
    metrics = {}
    for bt, gt in ref.items():
        name = f"JSD_{bt[0]}{sym.get(bt[2], '?')}{bt[1]}"
        metrics[name] = (float(jensenshannon(gt, prof[bt]))
                         if bt in prof else None)
    vals = [v for v in metrics.values() if v is not None]
    metrics["JSD_BL_mean"] = float(np.mean(vals)) if vals else None
    return metrics


# ---------------------------------------------------------------------------
# pairwise distances (CC under 2A, all under 12A)
# ---------------------------------------------------------------------------

def pair_length_profile(mols: Sequence[Molecule]) -> Dict[str, np.ndarray]:
    cc, alld = [], []
    for m in mols:
        z = m.atomic_numbers
        d = np.linalg.norm(m.pos[:, None] - m.pos[None], axis=-1)
        iu = np.triu_indices(m.num_atoms, 1)
        dd = d[iu]
        zz1, zz2 = z[iu[0]], z[iu[1]]
        cc += dd[(zz1 == 6) & (zz2 == 6) & (dd < 2)].tolist()
        alld += dd[dd < 12].tolist()
    return {"CC_2A": get_distribution(cc, PAIR_BINS["CC_2A"]),
            "All_12A": get_distribution(alld, PAIR_BINS["All_12A"])}


def eval_pair_length_jsd(mols: Sequence[Molecule]) -> Dict[str, Optional[float]]:
    prof = pair_length_profile(mols)
    ref = ref_pairdist_distributions()
    out = {}
    for k, gt in ref.items():
        if k in prof and len(gt) == len(prof[k]):
            out[f"JSD_{k}"] = float(jensenshannon(gt, prof[k]))
        else:
            out[f"JSD_{k}"] = None
    return out


# ---------------------------------------------------------------------------
# bond angles
# ---------------------------------------------------------------------------

def mol_bond_angles(mol: Molecule):
    """(z1, b12, z2, b23, z3) -> angle at the middle atom, degrees."""
    adj = mol.neighbors()
    out = []
    for j in range(mol.num_atoms):
        nbrs = sorted(adj[j])
        for a in range(len(nbrs)):
            for b in range(a + 1, len(nbrs)):
                i, k = nbrs[a], nbrs[b]
                b_ij = mol.bonds[(min(i, j), max(i, j))]
                b_jk = mol.bonds[(min(j, k), max(j, k))]
                z1, z2, z3 = (int(mol.atomic_numbers[i]),
                              int(mol.atomic_numbers[j]),
                              int(mol.atomic_numbers[k]))
                if (z1, b_ij) > (z3, b_jk):
                    z1, z3 = z3, z1
                    b_ij, b_jk = b_jk, b_ij
                v1 = mol.pos[i] - mol.pos[j]
                v2 = mol.pos[k] - mol.pos[j]
                cos = np.dot(v1, v2) / (np.linalg.norm(v1)
                                        * np.linalg.norm(v2) + 1e-9)
                ang = float(np.degrees(np.arccos(np.clip(cos, -1, 1))))
                out.append(((z1, b_ij, z2, b_jk, z3), ang))
    return out


def bond_angle_profile(mols: Sequence[Molecule]) -> Dict:
    prof = collections.defaultdict(list)
    for m in mols:
        for at, ang in mol_bond_angles(m):
            prof[at].append(ang)
    return {k: get_distribution(v, ANGLE_BINS) for k, v in prof.items()}


def eval_bond_angle_jsd(mols: Sequence[Molecule]) -> Dict[str, Optional[float]]:
    prof = bond_angle_profile(mols)
    ref = ref_angle_distributions()
    sym = {1: "-", 2: "=", 3: "#", 4: ":"}
    metrics = {}
    for at, gt in ref.items():
        name = (f"JSD_{at[0]}{sym.get(at[1], '?')}{at[2]}"
                f"{sym.get(at[3], '?')}{at[4]}")
        metrics[name] = (float(jensenshannon(gt, prof[at]))
                         if at in prof else None)
    vals = [v for v in metrics.values() if v is not None]
    metrics["JSD_BA_mean"] = float(np.mean(vals)) if vals else None
    return metrics


# ---------------------------------------------------------------------------
# stability (reference: eval_stability.py:9-141)
# ---------------------------------------------------------------------------

_SYM = {1: "H", 6: "C", 7: "N", 8: "O", 9: "F", 15: "P", 16: "S", 17: "Cl"}
_BONDS1 = {
    "H": {"H": 74, "C": 109, "N": 101, "O": 96, "F": 92, "P": 144, "S": 134, "Cl": 127},
    "C": {"H": 109, "C": 154, "N": 147, "O": 143, "F": 135, "P": 184, "S": 182, "Cl": 177},
    "N": {"H": 101, "C": 147, "N": 145, "O": 140, "F": 136, "P": 177, "S": 168, "Cl": 175},
    "O": {"H": 96, "C": 143, "N": 140, "O": 148, "F": 142, "P": 163, "S": 151, "Cl": 164},
    "F": {"H": 92, "C": 135, "N": 136, "O": 142, "F": 142, "P": 156, "S": 158, "Cl": 166},
    "P": {"H": 144, "C": 184, "N": 177, "O": 163, "F": 156, "P": 221, "S": 210, "Cl": 203},
    "S": {"H": 134, "C": 182, "N": 168, "O": 151, "F": 158, "P": 210, "S": 204, "Cl": 207},
    "Cl": {"H": 127, "C": 177, "N": 175, "O": 164, "F": 166, "P": 203, "S": 207, "Cl": 199},
}
_BONDS2 = {
    "C": {"C": 134, "N": 129, "O": 120, "S": 160},
    "N": {"C": 129, "N": 125, "O": 121},
    "O": {"C": 120, "N": 121, "O": 121, "P": 150},
    "P": {"O": 150, "S": 186},
    "S": {"C": 160, "P": 186},
}
_BONDS3 = {"C": {"C": 120, "N": 116, "O": 113}, "N": {"C": 116, "N": 110},
           "O": {"C": 113}}
_MARGIN1, _MARGIN2, _MARGIN3 = 10, 5, 3
_ALLOWED = {"H": 1, "C": 4, "N": 3, "O": 2, "F": 1, "P": 5, "S": 4, "Cl": 1}


def _bond_order(s1: str, s2: str, dist: float) -> int:
    d = 100 * dist
    if d < _BONDS1[s1][s2] + _MARGIN1:
        if d < _BONDS2.get(s1, {}).get(s2, -1) + _MARGIN2:
            if d < _BONDS3.get(s1, {}).get(s2, -1) + _MARGIN3:
                return 3
            return 2
        return 1
    return 0


def check_stability(pos: np.ndarray, atomic_numbers: np.ndarray,
                    count_hs: bool = False):
    """-> (molecule_stable, n_stable_atoms, n_atoms). Distance-derived bond
    orders; an atom is stable when 0 < order-sum <= allowed valence."""
    pos = np.asarray(pos, float)
    n = len(atomic_numbers)
    syms = [_SYM.get(int(z), "C") for z in atomic_numbers]
    nr_bonds = np.zeros(n, int)
    for i in range(n):
        for j in range(i + 1, n):
            dist = float(np.linalg.norm(pos[i] - pos[j]))
            order = _bond_order(syms[i], syms[j], dist)
            nr_bonds[i] += order
            nr_bonds[j] += order
    stable = 0
    for s, nb in zip(syms, nr_bonds):
        if count_hs:
            ok = _ALLOWED[s] == nb
        else:
            ok = _ALLOWED[s] >= nb > 0
        stable += int(ok)
    return stable == n, stable, n


def analyze_stability(mols: Sequence[Molecule]) -> Dict[str, float]:
    n_mol_stable = n_atom_stable = n_atoms = 0
    for m in mols:
        ok, stable, n = check_stability(m.pos, m.atomic_numbers)
        n_mol_stable += int(ok)
        n_atom_stable += stable
        n_atoms += n
    return {"mol_stable": n_mol_stable / max(len(mols), 1),
            "atm_stable": n_atom_stable / max(n_atoms, 1)}


# ---------------------------------------------------------------------------
# steric clash (reference: eval_steric_clash.py:56-135)
# ---------------------------------------------------------------------------

DEFAULT_VDW = {1: 1.2, 6: 1.7, 7: 1.55, 8: 1.52, 9: 1.47, 15: 1.8, 16: 1.8,
               17: 1.75, 35: 1.85, 53: 1.98, 34: 1.9, 5: 1.92}


def detect_clash(pos_dst, pos_src, el_dst, el_src, pair_mask=None,
                 vdw=DEFAULT_VDW, tolerance: float = 0.4):
    d = np.linalg.norm(np.asarray(pos_dst)[:, None]
                       - np.asarray(pos_src)[None], axis=-1)
    if pair_mask is None:
        pair_mask = np.ones(d.shape, bool)
    r_dst = np.array([vdw.get(int(a), 1.7) for a in el_dst])
    r_src = np.array([vdw.get(int(a), 1.7) for a in el_src])
    thr = r_dst[:, None] + r_src[None] - tolerance
    clashes = (d < thr) & pair_mask
    idx = np.where(clashes)
    return bool(clashes.any()), {
        "clashed_indices": idx[0],
        "clash_atom_num": len(np.unique(idx[0])),
        "atom_num": len(pos_dst),
    }


def eval_steric_clash(mol: Molecule, protein_pos, protein_elements,
                      tolerance: float = 0.4):
    """Ligand-protein + intra-ligand (non-bonded) vdW clash detection."""
    n = mol.num_atoms
    bond_adj = np.zeros((n, n), bool)
    for (i, j) in mol.bonds:
        bond_adj[i, j] = bond_adj[j, i] = True
    intra_mask = (~bond_adj) ^ np.eye(n, dtype=bool)

    lp, lp_info = detect_clash(mol.pos, protein_pos, mol.atomic_numbers,
                               protein_elements, tolerance=tolerance)
    ll, ll_info = detect_clash(mol.pos, mol.pos, mol.atomic_numbers,
                               mol.atomic_numbers, pair_mask=intra_mask,
                               tolerance=tolerance)
    # pose-quality diagnostic: the molecule's closest approach to the
    # protein surface (crystal ligands sit ~2.5-3.5 A; sub-vdW values
    # flag poses grown into the pocket wall)
    d_lp = np.linalg.norm(np.asarray(mol.pos)[:, None]
                          - np.asarray(protein_pos)[None], axis=-1)
    nearest = float(d_lp.min()) if d_lp.size else float("nan")
    return lp, {"lig_pro_clash_detected": lp, "lig_lig_clash_detected": ll,
                "lig_pro_clash": lp_info, "lig_lig_clash": ll_info,
                "nearest_protein_dist": nearest}

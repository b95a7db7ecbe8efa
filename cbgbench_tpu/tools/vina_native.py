"""Native AutoDock Vina *score-only* scoring function (pure numpy, host).

The reference's headline chem metric is the Vina affinity
(reference: repo/tools/docking_vina.py:137-151, exhaustiveness 16,
score_only/minimize/dock); the Vina binary is absent from this image, so
this module implements the published Vina scoring function itself — the
5-term empirical potential over heavy-atom pairs within 8 Å plus the
rotor penalty (Trott & Olson 2010, J Comput Chem 31:455, Table 1) — which
needs no conformational search in score-only mode.

    c_inter = sum over lig-rec heavy pairs (r < 8 Å), d = r - R_i - R_j:
        gauss1      exp(-(d/0.5)^2)                 w = -0.035579
        gauss2      exp(-((d-3)/2)^2)               w = -0.005156
        repulsion   d^2 if d < 0 else 0             w =  0.840245
        hydrophobic lin. step 1->0 over d in [0.5,1.5]   w = -0.035069
                    (both atoms hydrophobic)
        h_bond      lin. step 1->0 over d in [-0.7,0.0]  w = -0.587439
                    (donor/acceptor pair)
    affinity = c_inter / (1 + 0.05846 * N_rot)

Everything is reported with ``vina_native_approximate: True``: atom typing
here derives donors/acceptors/hydrophobes from our bond graph and residue
tables rather than from the meeko/AutoDockTools pdbqt pipeline, so numbers
can differ from the binary at the typing margin (not in the term math,
which is pinned term-by-term in tests/test_vina_native.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..chem.mol import Molecule

# --- published weights (Vina paper Table 1 / vina source everything.cpp) ---
W_GAUSS1 = -0.035579
W_GAUSS2 = -0.005156
W_REPULSION = 0.840245
W_HYDROPHOBIC = -0.035069
W_HBOND = -0.587439
W_ROT = 0.05846
CUTOFF = 8.0

# X-Score vdW radii by atomic number (vina atom_constants.h xs_vdw_radius;
# every nitrogen/oxygen subtype shares one radius so a Z-keyed table is
# exact for the elements SBDD produces).
XS_RADIUS = {
    6: 1.9,    # C (C_H and C_P share 1.9)
    7: 1.8,    # N
    8: 1.7,    # O
    9: 1.5,    # F
    15: 2.1,   # P
    16: 2.0,   # S
    17: 1.8,   # Cl
    34: 2.0,   # Se (vina treats as S-like)
    35: 2.0,   # Br
    53: 2.2,   # I
}
_DEFAULT_RADIUS = 1.9
_HALOGENS = (9, 17, 35, 53)


# ---------------------------------------------------------------------------
# term functions (vectorized over surface distance d)
# ---------------------------------------------------------------------------

def term_gauss1(d: np.ndarray) -> np.ndarray:
    return np.exp(-np.square(d / 0.5))


def term_gauss2(d: np.ndarray) -> np.ndarray:
    return np.exp(-np.square((d - 3.0) / 2.0))


def term_repulsion(d: np.ndarray) -> np.ndarray:
    return np.where(d < 0.0, d * d, 0.0)


def _slope_step(d: np.ndarray, good: float, bad: float) -> np.ndarray:
    """1 where d <= good, 0 where d >= bad, linear in between."""
    return np.clip((bad - d) / (bad - good), 0.0, 1.0)


def term_hydrophobic(d: np.ndarray) -> np.ndarray:
    return _slope_step(d, 0.5, 1.5)


def term_hbond(d: np.ndarray) -> np.ndarray:
    return _slope_step(d, -0.7, 0.0)


# ---------------------------------------------------------------------------
# ligand atom typing (from our bond graph)
# ---------------------------------------------------------------------------

def ligand_typing(mol: Molecule) -> Dict[str, np.ndarray]:
    """Per-atom radius/hydrophobic/donor/acceptor for a reconstructed
    ligand. Hydrophobic = carbon with no non-carbon heavy neighbor, or a
    halogen (vina xs typing: C_H vs C_P). Acceptor = N/O; donor = N/O
    carrying at least one implicit hydrogen by valence count (pdbqt would
    read explicit polar hydrogens instead — flagged approximate)."""
    n = mol.num_atoms
    z = np.asarray(mol.atomic_numbers, int)
    adj = mol.neighbors()

    radius = np.array([XS_RADIUS.get(int(zz), _DEFAULT_RADIUS) for zz in z])
    heavy = z > 1

    hydrophobic = np.zeros(n, bool)
    donor = np.zeros(n, bool)
    acceptor = np.zeros(n, bool)
    # standard neutral valences for implicit-H counting
    full_valence = {6: 4.0, 7: 3.0, 8: 2.0, 16: 2.0, 15: 3.0}
    for i in range(n):
        zi = int(z[i])
        if zi == 6:
            hydrophobic[i] = all(int(z[j]) in (1, 6) for j in adj[i])
        elif zi in _HALOGENS:
            hydrophobic[i] = True
        if zi in (7, 8):
            acceptor[i] = True
            implicit_h = full_valence[zi] - mol.bond_valence(i)
            donor[i] = implicit_h >= 0.5
    return {"radius": radius, "hydrophobic": hydrophobic,
            "donor": donor, "acceptor": acceptor, "heavy": heavy}


# ---------------------------------------------------------------------------
# protein atom typing (from residue atom-name tables; the pocket PDB
# carries no hydrogens or bond graph)
# ---------------------------------------------------------------------------

# side-chain carbons bonded only to C/H (=> xs hydrophobic C_H); backbone
# CA/C are bonded to N / =O and therefore polar everywhere
_HYDROPHOBIC_SC = {
    "ALA": {"CB"},
    "VAL": {"CB", "CG1", "CG2"},
    "LEU": {"CB", "CG", "CD1", "CD2"},
    "ILE": {"CB", "CG1", "CG2", "CD1"},
    "MET": {"CB"},                       # CG/CE bond to SD
    "PHE": {"CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ"},
    "TRP": {"CB", "CG", "CD2", "CE3", "CZ3", "CH2", "CZ2"},
    "PRO": {"CB", "CG"},                 # CD bonds to backbone N
    "TYR": {"CB", "CG", "CD1", "CD2", "CE1", "CE2"},   # CZ bonds to OH
    "THR": {"CG2"},
    "LYS": {"CB", "CG", "CD"},           # CE bonds to NZ
    "ARG": {"CB", "CG"},                 # CD bonds to NE
    "GLU": {"CB", "CG"},
    "GLN": {"CB", "CG"},
    "ASP": {"CB"},
    "ASN": {"CB"},
    "HIS": {"CB"},
    "CYS": set(),                        # CB bonds to SG
    "SER": set(),                        # CB bonds to OG
    "GLY": set(),
}

# N/O donors & acceptors by (resname, atom name). Backbone: N donor
# (amide NH), O/OXT acceptor. His/ His tautomers: both ring N can do both.
_DONOR_SC = {
    "ARG": {"NE", "NH1", "NH2"},
    "LYS": {"NZ"},
    "HIS": {"ND1", "NE2"},
    "TRP": {"NE1"},
    "ASN": {"ND2"},
    "GLN": {"NE2"},
    "SER": {"OG"},
    "THR": {"OG1"},
    "TYR": {"OH"},
}
_ACCEPTOR_SC = {
    "ASP": {"OD1", "OD2"},
    "GLU": {"OE1", "OE2"},
    "ASN": {"OD1"},
    "GLN": {"OE1"},
    "SER": {"OG"},
    "THR": {"OG1"},
    "TYR": {"OH"},
    "HIS": {"ND1", "NE2"},
}


def protein_typing(elements: np.ndarray, atom_names: List[str],
                   resnames: List[str]) -> Dict[str, np.ndarray]:
    """Typing for pocket atoms from residue tables (no protein H/bonds in
    the PDB shells). ``resnames`` are 3-letter codes per atom."""
    z = np.asarray(elements, int)
    n = len(z)
    radius = np.array([XS_RADIUS.get(int(zz), _DEFAULT_RADIUS) for zz in z])
    heavy = z > 1
    hydrophobic = np.zeros(n, bool)
    donor = np.zeros(n, bool)
    acceptor = np.zeros(n, bool)
    for i in range(n):
        name = atom_names[i] if i < len(atom_names) else ""
        res = resnames[i] if i < len(resnames) else ""
        zi = int(z[i])
        if zi == 6:
            hydrophobic[i] = name in _HYDROPHOBIC_SC.get(res, set())
        elif zi == 7:
            donor[i] = (name == "N") or name in _DONOR_SC.get(res, set())
            acceptor[i] = name in _ACCEPTOR_SC.get(res, set())
        elif zi == 8:
            acceptor[i] = True
            donor[i] = name in _DONOR_SC.get(res, set())
    return {"radius": radius, "hydrophobic": hydrophobic,
            "donor": donor, "acceptor": acceptor, "heavy": heavy}


# ---------------------------------------------------------------------------
# rotor counting
# ---------------------------------------------------------------------------

def count_rotatable_bonds(mol: Molecule) -> int:
    """Active torsions the pdbqt pipeline would declare: acyclic single
    bonds between heavy atoms that each have >= 1 other heavy neighbor,
    excluding amide C-N bonds (AutoDockTools' non-rotatable list)."""
    ring_atoms = set()
    ring_edges = set()
    for ring in mol.rings():
        ring_atoms.update(ring)
        m = len(ring)
        for a in range(m):
            i, j = ring[a], ring[(a + 1) % m]
            ring_edges.add((min(i, j), max(i, j)))
    adj = mol.neighbors()
    z = mol.atomic_numbers
    n_rot = 0
    for (i, j), order in mol.bonds.items():
        if order != 1:
            continue
        if (i, j) in ring_edges:
            continue
        if mol.degree(i) < 2 or mol.degree(j) < 2:
            continue
        # amide: C(=O)-N in either direction
        def is_amide(c, nn):
            if int(z[c]) != 6 or int(z[nn]) != 7:
                return False
            return any(int(z[k]) == 8
                       and mol.bonds.get((min(c, k), max(c, k))) == 2
                       for k in adj[c])
        if is_amide(i, j) or is_amide(j, i):
            continue
        n_rot += 1
    return n_rot


# ---------------------------------------------------------------------------
# the score
# ---------------------------------------------------------------------------

def pairwise_terms(lig_pos: np.ndarray, lig_t: Dict[str, np.ndarray],
                   rec_pos: np.ndarray, rec_t: Dict[str, np.ndarray]
                   ) -> Dict[str, float]:
    """Unweighted per-term intermolecular sums over heavy-atom pairs within
    the 8 Å cutoff (the breakdown vina's score-only mode prints)."""
    lm, rm = lig_t["heavy"], rec_t["heavy"]
    lp, rp = lig_pos[lm], rec_pos[rm]
    lr = lig_t["radius"][lm]
    rr = rec_t["radius"][rm]
    if len(lp) == 0 or len(rp) == 0:
        return {k: 0.0 for k in
                ("gauss1", "gauss2", "repulsion", "hydrophobic", "hbond")}

    diff = lp[:, None, :] - rp[None, :, :]
    r = np.sqrt(np.sum(diff * diff, -1))
    within = r < CUTOFF
    d = r - lr[:, None] - rr[None, :]

    hyd_pair = (lig_t["hydrophobic"][lm][:, None]
                & rec_t["hydrophobic"][rm][None, :])
    hb_pair = ((lig_t["donor"][lm][:, None] & rec_t["acceptor"][rm][None, :])
               | (lig_t["acceptor"][lm][:, None]
                  & rec_t["donor"][rm][None, :]))

    return {
        "gauss1": float(np.sum(term_gauss1(d) * within)),
        "gauss2": float(np.sum(term_gauss2(d) * within)),
        "repulsion": float(np.sum(term_repulsion(d) * within)),
        "hydrophobic": float(np.sum(term_hydrophobic(d) * within * hyd_pair)),
        "hbond": float(np.sum(term_hbond(d) * within * hb_pair)),
    }


def score_only(mol: Molecule, rec_pos: np.ndarray,
               rec_typing: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Vina score-only affinity (kcal/mol) of a ligand pose against typed
    receptor atoms. Returns the term breakdown + weighted inter energy +
    rotor-penalized affinity."""
    lt = ligand_typing(mol)
    terms = pairwise_terms(np.asarray(mol.pos, float), lt,
                           np.asarray(rec_pos, float), rec_typing)
    inter = (W_GAUSS1 * terms["gauss1"] + W_GAUSS2 * terms["gauss2"]
             + W_REPULSION * terms["repulsion"]
             + W_HYDROPHOBIC * terms["hydrophobic"]
             + W_HBOND * terms["hbond"])
    n_rot = count_rotatable_bonds(mol)
    affinity = inter / (1.0 + W_ROT * n_rot)
    out = dict(terms)
    out.update({"inter": float(inter), "n_rot": float(n_rot),
                "affinity": float(affinity)})
    return out


def typing_from_pocket(pocket) -> Dict[str, np.ndarray]:
    """Build protein typing from a chem.pdb.PocketAtoms (atom names +
    parent-residue classes are already parsed there)."""
    from ..constants.protein import AA
    resnames = [AA(int(a)).name if int(a) < len(AA) else "UNK"
                for a in np.asarray(pocket.atom_to_aa_type, int)]
    return protein_typing(pocket.element, list(pocket.atom_name), resnames)


def score_only_pdb(mol: Molecule, protein_pdb: str) -> Optional[Dict[str, float]]:
    """Convenience: parse the pocket PDB and score. Returns None if the
    PDB cannot be parsed."""
    try:
        from ..chem.pdb import parse_pdb_pocket
        pocket, _ = parse_pdb_pocket(protein_pdb)
    except Exception:
        return None
    return score_only(mol, pocket.pos, typing_from_pocket(pocket))


def _rotate_aa(pos: np.ndarray, center: np.ndarray,
               w: np.ndarray) -> np.ndarray:
    """Axis-angle rotation of pos about center (Rodrigues)."""
    theta = float(np.linalg.norm(w))
    if theta < 1e-12:
        return pos.copy()
    k = w / theta
    p = pos - center
    return (p * np.cos(theta)
            + np.cross(k, p) * np.sin(theta)
            + k[None] * (p @ k)[:, None] * (1 - np.cos(theta))) + center


def minimize_rigid(mol: Molecule, rec_pos: np.ndarray,
                   rec_typing: Dict[str, np.ndarray],
                   steps: int = 60) -> Dict[str, float]:
    """Rigid-body local minimization of the Vina inter energy
    (approximates ``vina --local_only``: the binary's BFGS also relaxes
    torsions; the rigid 6-DOF version needs no torsion tree and keeps
    the generator's internal geometry untouched). Numeric central-
    difference gradient over (translation, axis-angle) with an adaptive
    step, monotone by construction. Returns the score-only breakdown of
    the minimized pose plus ``affinity_before`` and the rigid
    displacement applied.

    Reference protocol: repo/tools/docking_vina.py:137-151 runs
    score_only / minimize / dock; this provides the native 'minimize'
    column (flagged approximate like score_only)."""
    lt = ligand_typing(mol)
    pos0 = np.asarray(mol.pos, float)
    rec_pos = np.asarray(rec_pos, float)
    center = pos0.mean(0)
    # receptor subset: only atoms that can ever enter the 8 Å cutoff
    # during a local move (ligand radius + cutoff + DRIFT margin) —
    # ~4x fewer pairs per energy call on real pockets, exact result;
    # the optimizer clamps |t| to DRIFT below so the bound really holds
    DRIFT = 4.0
    reach = (float(np.linalg.norm(pos0 - center, axis=-1).max())
             + CUTOFF + DRIFT)
    near = np.linalg.norm(rec_pos - center, axis=-1) < reach
    rec_pos = rec_pos[near]
    rec_typing = {k: np.asarray(v)[near] for k, v in rec_typing.items()}

    # precompute the masked pair matrices once (typing never changes)
    lm = lt["heavy"]
    rm = rec_typing["heavy"]
    lp0 = pos0[lm]
    rp = rec_pos[rm]
    lr_rad = lt["radius"][lm]
    rr_rad = rec_typing["radius"][rm]
    hyd_pair = (lt["hydrophobic"][lm][:, None]
                & rec_typing["hydrophobic"][rm][None, :])
    hb_pair = ((lt["donor"][lm][:, None]
                & rec_typing["acceptor"][rm][None, :])
               | (lt["acceptor"][lm][:, None]
                  & rec_typing["donor"][rm][None, :]))
    rad_sum = lr_rad[:, None] + rr_rad[None, :]

    def energy_batch(poses):
        """poses [P, L_heavy, 3] -> [P] weighted inter energies — one
        vectorized pairwise pass for all gradient probes."""
        diff = poses[:, :, None, :] - rp[None, None]
        r = np.sqrt(np.sum(diff * diff, -1))            # [P, L, R]
        within = r < CUTOFF
        d = r - rad_sum[None]
        e = (W_GAUSS1 * term_gauss1(d) + W_GAUSS2 * term_gauss2(d)
             + W_REPULSION * term_repulsion(d)
             + W_HYDROPHOBIC * term_hydrophobic(d) * hyd_pair[None]
             + W_HBOND * term_hbond(d) * hb_pair[None])
        return np.sum(e * within, axis=(1, 2))

    def pose(t, w):
        return _rotate_aa(lp0, center, w) + t

    t = np.zeros(3)
    w = np.zeros(3)
    e = float(energy_batch(pose(t, w)[None])[0])
    e_start = e
    lr = 0.05
    h = 1e-3
    eye = np.eye(3) * h
    for _ in range(steps):
        probes = []
        for i in range(3):
            probes.append(pose(t + eye[i], w))
            probes.append(pose(t - eye[i], w))
            probes.append(pose(t, w + eye[i]))
            probes.append(pose(t, w - eye[i]))
        ev = energy_batch(np.stack(probes))             # [12]
        g = np.array([(ev[4 * i] - ev[4 * i + 1]) / (2 * h)
                      for i in range(3)]
                     + [(ev[4 * i + 2] - ev[4 * i + 3]) / (2 * h)
                        for i in range(3)])
        nrm = float(np.linalg.norm(g))
        if nrm < 1e-7:
            break
        cand_t = t - lr * g[:3] / nrm
        tn = float(np.linalg.norm(cand_t))
        if tn > DRIFT:          # stay inside the receptor-subset margin
            cand_t = cand_t * (DRIFT / tn)
        cand_w = w - lr * g[3:] / nrm
        e_cand = float(energy_batch(pose(cand_t, cand_w)[None])[0])
        if e_cand < e:
            t, w, e = cand_t, cand_w, e_cand
            lr = min(lr * 1.3, 0.4)
        else:
            lr *= 0.5
            if lr < 1e-4:
                break

    final = Molecule(mol.atomic_numbers,
                     (_rotate_aa(pos0, center, w) + t).astype(np.float32),
                     bonds=dict(mol.bonds), aromatic=mol.aromatic,
                     name=mol.name)
    out = score_only(final, rec_pos, rec_typing)
    out["affinity_before"] = float(
        e_start / (1.0 + W_ROT * out["n_rot"]))
    out["rigid_shift"] = float(np.linalg.norm(t))
    out["rigid_rot_rad"] = float(np.linalg.norm(w))
    return out

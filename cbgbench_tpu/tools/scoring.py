"""Chemical property scoring: QED, SA, LogP, Lipinski, ring sizes.

Reference behavior: repo/tools/scoring.py:72-89 (get_chem) computing RDKit
QED / Ertl SA (sascorer.py + fpscores.pkl.gz) / Crippen LogP / Lipinski.
When RDKit is importable the exact implementations run; otherwise
documented pure-python approximations keep the pipeline end-to-end (their
absolute values differ from RDKit, their ordering is broadly consistent —
they are marked by the 'approx' flag in the result).
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np

from ..chem.mol import Molecule

try:
    from rdkit import Chem
    from rdkit.Chem import Crippen, Descriptors, Lipinski, QED
    HAS_RDKIT = True
except Exception:  # pragma: no cover
    HAS_RDKIT = False

_ATOMIC_MASS = {1: 1.008, 5: 10.81, 6: 12.011, 7: 14.007, 8: 15.999,
                9: 18.998, 15: 30.974, 16: 32.06, 17: 35.45, 35: 79.904,
                53: 126.90}

# crude per-atom logP contributions (Crippen-flavored averages)
_LOGP_CONTRIB = {6: 0.25, 7: -0.6, 8: -0.55, 9: 0.2, 15: -0.5, 16: 0.35,
                 17: 0.65, 35: 0.85, 53: 1.0}


def _mol_to_rdkit(mol: Molecule):
    rd = Chem.RWMol()
    for z in mol.atomic_numbers:
        rd.AddAtom(Chem.Atom(int(z)))
    order_map = {1: Chem.BondType.SINGLE, 2: Chem.BondType.DOUBLE,
                 3: Chem.BondType.TRIPLE, 4: Chem.BondType.AROMATIC}
    for (i, j), cls in mol.bonds.items():
        rd.AddBond(int(i), int(j), order_map.get(cls, Chem.BondType.SINGLE))
    m = rd.GetMol()
    Chem.SanitizeMol(m)
    return m


def _approx_descriptors(mol: Molecule) -> Dict[str, float]:
    z = mol.atomic_numbers
    mw = float(sum(_ATOMIC_MASS.get(int(a), 12.0) for a in z))
    n_hba = int(np.isin(z, [7, 8]).sum())
    # HBD approximation: N/O with free valence (would carry an H)
    n_hbd = 0
    for i, a in enumerate(z):
        if int(a) in (7, 8):
            free = {7: 3, 8: 2}[int(a)] - mol.bond_valence(i)
            if free >= 0.5:
                n_hbd += 1
    rings = mol.rings()
    ring_atoms = set(a for r in rings for a in r)
    arom_rings = sum(1 for r in rings
                     if mol.aromatic is not None
                     and all(mol.aromatic[a] for a in r))
    # rotatable: single acyclic bonds between non-terminal heavy atoms
    rotb = 0
    for (i, j), cls in mol.bonds.items():
        if cls == 1 and mol.degree(i) > 1 and mol.degree(j) > 1:
            if not any(i in r and j in r for r in rings):
                rotb += 1
    logp = float(sum(_LOGP_CONTRIB.get(int(a), 0.0) for a in z))
    logp += 0.15 * sum(1 for a in ring_atoms
                       if mol.aromatic is not None and mol.aromatic[a])
    tpsa = 23.8 * sum(1 for a in z if int(a) == 7) + \
        17.1 * sum(1 for a in z if int(a) == 8)
    return {"mw": mw, "hba": n_hba, "hbd": n_hbd, "rotb": rotb,
            "arom": arom_rings, "logp": logp, "tpsa": tpsa,
            "n_rings": len(rings)}


def _qed_desirability(x, a, b, c, d, e, f, dmax):
    return (a + b / (1 + math.exp(-(x - c + d / 2) / e))
            * (1 - 1 / (1 + math.exp(-(x - c - d / 2) / f)))) / dmax


# QED ADS parameters (Bickerton et al. 2012, table 1)
_QED_ADS = {
    "mw": (2.817, 392.575, 290.749, 2.420, 49.223, 65.371, 104.981),
    "logp": (3.172, 137.862, 2.535, 4.581, 0.823, 0.576, 131.319),
    "hba": (2.948, 160.461, 3.615, 4.436, 0.290, 1.301, 148.776),
    "hbd": (1.619, 1010.051, 0.985, 0.000, 0.714, 0.921, 258.163),
    "tpsa": (1.877, 125.223, 62.908, 87.834, 12.020, 28.513, 104.569),
    "rotb": (0.010, 272.412, 2.558, 1.566, 1.272, 2.758, 105.137),
    "arom": (3.218, 957.737, 2.275, 0.000, 1.318, 0.376, 312.337),
}
_QED_WEIGHTS = {"mw": 0.66, "logp": 0.46, "hba": 0.05, "hbd": 0.61,
                "tpsa": 0.06, "rotb": 0.65, "arom": 0.48}


def _approx_qed(desc: Dict[str, float]) -> float:
    total_w = 0.0
    acc = 0.0
    for k, params in _QED_ADS.items():
        a, b, c, d, e, f, dmax = params
        x = desc[k]
        val = max(_qed_desirability(x, a, b, c, d, e, f, dmax), 1e-6)
        acc += _QED_WEIGHTS[k] * math.log(val)
        total_w += _QED_WEIGHTS[k]
    return float(math.exp(acc / total_w))


def _approx_sa(mol: Molecule, desc: Dict[str, float]) -> float:
    """Complexity-penalty-only Ertl SA approximation (1 easy .. 10 hard)."""
    n = mol.num_atoms
    rings = mol.rings()
    # macrocycle + ring-bridge penalties
    macro = sum(1 for r in rings if len(r) > 8)
    ring_atoms = [a for r in rings for a in r]
    bridge = max(0, len(ring_atoms) - len(set(ring_atoms)))
    size_penalty = n ** 1.005 - n
    stereo_proxy = 0.3 * sum(1 for i in range(n) if mol.degree(i) == 4)
    score = (1.5 + 0.35 * desc["n_rings"] + 0.25 * bridge + 0.6 * macro
             + 0.05 * size_penalty + stereo_proxy
             + 0.02 * max(0, n - 30))
    return float(np.clip(score, 1.0, 10.0))


def get_chem(mol: Molecule) -> Dict[str, float]:
    """QED / SA / LogP / Lipinski / ring-size histogram for one molecule."""
    if HAS_RDKIT:
        try:
            rd = _mol_to_rdkit(mol)
            from .sascorer_rdkit import calculate_sa  # lazy, needs fpscores
            qed = float(QED.qed(rd))
            sa = float(calculate_sa(rd))
            logp = float(Crippen.MolLogP(rd))
            lip = int(Lipinski.NumHDonors(rd) <= 5) + \
                int(Lipinski.NumHAcceptors(rd) <= 10) + \
                int(Descriptors.ExactMolWt(rd) <= 500) + \
                int(logp <= 5)
            ring_sizes = [len(r) for r in rd.GetRingInfo().AtomRings()]
            return {"qed": qed, "sa": sa, "logp": logp, "lipinski": lip,
                    "ring_sizes": ring_sizes, "approx": False}
        except Exception:
            pass
    desc = _approx_descriptors(mol)
    lip = (int(desc["hbd"] <= 5) + int(desc["hba"] <= 10)
           + int(desc["mw"] <= 500) + int(desc["logp"] <= 5))
    return {"qed": _approx_qed(desc), "sa": _approx_sa(mol, desc),
            "logp": desc["logp"], "lipinski": lip,
            "ring_sizes": [len(r) for r in mol.rings()], "approx": True}

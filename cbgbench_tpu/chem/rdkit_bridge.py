"""RDKit-gated refinement of reconstructed molecules.

The pure-python pipeline (chem.bonds.perceive_bonds) gives connectivity +
bond orders without native deps. When RDKit is importable this module
upgrades the result to the reference's post-processing semantics
(reference: repo/tools/rdkit_utils.py:404-480 postprocess_rd_mol_1/2,
:596-641 clean_frags + evaluate_validity): radical-pair bond upgrades,
3-membered hetero-ring fixes, charge neutralization, sanitization, and the
reference's RDKit-based validity rule ('.' not in canonical SMILES).

Everything here is host-side and optional; `HAS_RDKIT` gates all use.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .mol import Molecule

try:
    from rdkit import Chem
    from rdkit.Chem import AllChem  # noqa: F401
    from rdkit.Geometry import Point3D
    HAS_RDKIT = True
except Exception:  # pragma: no cover - environment without rdkit
    Chem = None
    HAS_RDKIT = False

_BOND_CLASS_TO_RD = None
_RD_TO_BOND_CLASS = None
if HAS_RDKIT:
    _BOND_CLASS_TO_RD = {
        1: Chem.BondType.SINGLE,
        2: Chem.BondType.DOUBLE,
        3: Chem.BondType.TRIPLE,
        4: Chem.BondType.AROMATIC,
    }
    _RD_TO_BOND_CLASS = {
        Chem.BondType.SINGLE: 1,
        Chem.BondType.DOUBLE: 2,
        Chem.BondType.TRIPLE: 3,
        Chem.BondType.AROMATIC: 4,
    }


def _require_rdkit():
    if not HAS_RDKIT:
        raise ImportError("rdkit is not installed; the pure-python path in "
                          "cbgbench_tpu.chem.bonds is the fallback")


def to_rdkit(mol: Molecule, sanitize: bool = False):
    """Molecule -> RDKit RWMol with a 3D conformer."""
    _require_rdkit()
    rw = Chem.RWMol()
    for z in mol.atomic_numbers:
        rw.AddAtom(Chem.Atom(int(z)))
    for (i, j), cls in sorted(mol.bonds.items()):
        rw.AddBond(int(i), int(j), _BOND_CLASS_TO_RD.get(int(cls),
                                                         Chem.BondType.SINGLE))
    conf = Chem.Conformer(mol.num_atoms)
    for i in range(mol.num_atoms):
        x, y, z_ = (float(v) for v in mol.pos[i])
        conf.SetAtomPosition(i, Point3D(x, y, z_))
    rw.AddConformer(conf, assignId=True)
    out = rw.GetMol()
    if sanitize:
        Chem.SanitizeMol(out)
    return out


def from_rdkit(rdmol) -> Molecule:
    """RDKit mol -> Molecule (heavy atoms; keeps the first conformer)."""
    _require_rdkit()
    rdmol = Chem.RemoveHs(rdmol, sanitize=False)
    n = rdmol.GetNumAtoms()
    z = np.array([a.GetAtomicNum() for a in rdmol.GetAtoms()], int)
    if rdmol.GetNumConformers():
        conf = rdmol.GetConformer()
        pos = np.array([[conf.GetAtomPosition(i).x, conf.GetAtomPosition(i).y,
                         conf.GetAtomPosition(i).z] for i in range(n)])
    else:
        pos = np.zeros((n, 3))
    arom = np.array([a.GetIsAromatic() for a in rdmol.GetAtoms()], bool)
    out = Molecule(z, pos, aromatic=arom)
    for b in rdmol.GetBonds():
        out.add_bond(b.GetBeginAtomIdx(), b.GetEndAtomIdx(),
                     _RD_TO_BOND_CLASS.get(b.GetBondType(), 1))
    return out


def _postprocess_1(rdmol):
    """Upgrade bond order between adjacent radical atoms, then fold leftover
    radicals into implicit Hs (reference: rdkit_utils.py:404-445)."""
    upgrade = {Chem.BondType.SINGLE: Chem.BondType.DOUBLE,
               Chem.BondType.DOUBLE: Chem.BondType.TRIPLE}
    rdmol = Chem.RemoveHs(rdmol, sanitize=False)
    try:
        Chem.SanitizeMol(rdmol, Chem.SanitizeFlags.SANITIZE_PROPERTIES)
    except Exception:
        return rdmol
    for atom in rdmol.GetAtoms():
        idx = atom.GetIdx()
        nr = atom.GetNumRadicalElectrons()
        if nr > 0:
            for nb in atom.GetNeighbors():
                j = nb.GetIdx()
                if j <= idx:
                    continue
                nb_r = nb.GetNumRadicalElectrons()
                if nb_r > 0 and nr > 0:
                    bond = rdmol.GetBondBetweenAtoms(idx, j)
                    if bond.GetBondType() in upgrade:
                        bond.SetBondType(upgrade[bond.GetBondType()])
                        nb.SetNumRadicalElectrons(nb_r - 1)
                        nr -= 1
            atom.SetNumRadicalElectrons(nr)
        nr = atom.GetNumRadicalElectrons()
        if nr > 0:
            atom.SetNumRadicalElectrons(0)
            atom.SetNumExplicitHs(atom.GetNumExplicitHs() + nr)
    return rdmol


def _postprocess_2(rdmol):
    """Break hetero-hetero bonds in 3-rings, neutralize positive charges
    (reference: rdkit_utils.py:447-480)."""
    rw = Chem.RWMol(rdmol)
    try:
        Chem.FastFindRings(rw)
    except Exception:
        return rdmol
    for ring in rw.GetRingInfo().AtomRings():
        if len(ring) != 3:
            continue
        non_c = [i for i in ring if rw.GetAtomWithIdx(i).GetSymbol() != "C"]
        oxy = [i for i in ring if rw.GetAtomWithIdx(i).GetSymbol() == "O"]
        if len(non_c) == 2 and rw.GetBondBetweenAtoms(*non_c) is not None:
            rw.RemoveBond(*non_c)
        if len(oxy) == 2 and rw.GetBondBetweenAtoms(*oxy) is not None:
            rw.RemoveBond(*oxy)
            for o in oxy:
                a = rw.GetAtomWithIdx(o)
                a.SetNumExplicitHs(a.GetNumExplicitHs() + 1)
    out = rw.GetMol()
    for atom in out.GetAtoms():
        if atom.GetFormalCharge() > 0:
            atom.SetFormalCharge(0)
    return out


def refine_molecule(mol: Molecule) -> Molecule:
    """Run the reference post-processing over a pure-python reconstruction.

    Returns the refined Molecule on success; the input unchanged if RDKit
    cannot sanitize the candidate (the pure path is then authoritative)."""
    _require_rdkit()
    try:
        rdmol = to_rdkit(mol)
        rdmol = _postprocess_1(rdmol)
        rdmol = _postprocess_2(rdmol)
        Chem.SanitizeMol(rdmol)
        return from_rdkit(rdmol)
    except Exception:
        return mol


def rdkit_validity(mol: Molecule, min_atoms: int = 8,
                   frag_threshold: float = 0.8
                   ) -> Tuple[Optional[Molecule], bool]:
    """The reference's validity rule through RDKit: keep the largest
    fragment, require size >= threshold, and no '.' in the canonical
    SMILES (reference: rdkit_utils.py:596-641)."""
    _require_rdkit()
    try:
        rdmol = to_rdkit(mol)
        frags = Chem.GetMolFrags(rdmol, asMols=True, sanitizeFrags=False)
        big = max(frags, default=rdmol, key=lambda m: m.GetNumAtoms())
        if (big.GetNumAtoms() < min_atoms
                and big.GetNumAtoms() < frag_threshold * mol.num_atoms):
            return None, False
        Chem.SanitizeMol(big)
        smiles = Chem.MolToSmiles(big)
        if "." in smiles:
            return None, False
        return from_rdkit(big), True
    except Exception:
        return None, False


def bond_reconciliation(mol_pred: Molecule, mol_true: Molecule) -> dict:
    """Compare a perceived bond set against ground truth connectivity.

    Works on any pair of Molecules (no RDKit needed); used to measure
    perceive_bonds recall/precision against reference ligand SDF bond
    blocks and, when RDKit is present, against RDKit's own perception."""
    pred = set(mol_pred.bonds)
    true = set(mol_true.bonds)
    tp = len(pred & true)
    order_match = sum(1 for k in (pred & true)
                      if mol_pred.bonds[k] == mol_true.bonds[k])
    return {
        "recall": tp / max(len(true), 1),
        "precision": tp / max(len(pred), 1),
        "order_accuracy": order_match / max(tp, 1),
        "n_true": len(true), "n_pred": len(pred),
    }

"""Tripos MOL2 reader, pure python.

The reference reads mol2 ligands through RDKit/openbabel in its parsers
(reference: repo/datasets/parsers/molecule_parser.py and
repo/tools/eval_fg_type.py read ligand files by extension). This covers
the @<TRIPOS>MOLECULE/ATOM/BOND records: element from the SYBYL atom
type ("C.3" -> C, "N.pl3" -> N, bare "Br" -> Br), bond types 1/2/3
kept as orders, "am" (amide) -> 1, "ar" (aromatic) -> class 4 with
aromatic flags — the same conventions as chem/sdf.py so downstream
code (featurize, reconstruct, eval) is format-agnostic.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..constants.molecule import SYMBOL_TO_Z
from .mol import Molecule

_BOND_ORDER = {"1": 1, "2": 2, "3": 3, "am": 1, "ar": 4, "du": 1,
               "un": 1, "nc": 0}


def _element_of(sybyl: str) -> str:
    base = sybyl.split(".")[0].strip()
    if base in SYMBOL_TO_Z:
        return base
    cap = base.capitalize()
    if cap in SYMBOL_TO_Z:
        return cap
    # atom-name fallback: strip trailing digits ("BR1" -> "BR" -> "Br")
    letters = "".join(c for c in base if c.isalpha()).capitalize()
    return letters if letters in SYMBOL_TO_Z else "C"


def read_mol2(path: str) -> List[Molecule]:
    with open(path, "r") as f:
        lines = f.read().split("\n")

    mols: List[Molecule] = []
    i = 0
    while i < len(lines):
        if not lines[i].startswith("@<TRIPOS>MOLECULE"):
            i += 1
            continue
        name = lines[i + 1].strip()
        counts = lines[i + 2].split()
        n_atoms, n_bonds = int(counts[0]), int(counts[1])
        i += 3

        # find the ATOM section (skips SMALL/USER_CHARGES/comments)
        while i < len(lines) and not lines[i].startswith("@<TRIPOS>ATOM"):
            i += 1
        i += 1
        pos = np.zeros((n_atoms, 3))
        z = np.zeros(n_atoms, int)
        arom_type = np.zeros(n_atoms, bool)
        idmap = {}
        for a in range(n_atoms):
            f_ = lines[i + a].split()
            idmap[f_[0]] = a
            pos[a] = [float(f_[2]), float(f_[3]), float(f_[4])]
            z[a] = SYMBOL_TO_Z[_element_of(f_[5])]
            arom_type[a] = f_[5].endswith(".ar")
        i += n_atoms

        mol = Molecule(z, pos, name=name)
        while i < len(lines) and not lines[i].startswith("@<TRIPOS>BOND"):
            i += 1
        if i < len(lines):
            i += 1
            for b in range(n_bonds):
                f_ = lines[i + b].split()
                order = _BOND_ORDER.get(f_[3].lower(), 1)
                if order == 0:
                    continue
                mol.add_bond(idmap[f_[1]], idmap[f_[2]], order)
            i += n_bonds

        arom = arom_type.copy()
        for (a, b), cls in mol.bonds.items():
            if cls == 4:
                arom[a] = arom[b] = True
        mol.aromatic = arom
        mols.append(mol)
    return mols


def read_ligand(path: str, heavy_only: bool = True) -> List[Molecule]:
    """Extension-dispatched ligand reader (.sdf/.mol or .mol2).

    heavy_only strips explicit hydrogens (the reference's Chem.RemoveHs,
    molecule_parser.py:28) — mol2 files routinely carry them while the
    CrossDocked SDFs are already heavy-atom-only.
    """
    if path.endswith(".mol2"):
        mols = read_mol2(path)
    else:
        from .sdf import read_sdf
        mols = read_sdf(path)
    if heavy_only:
        mols = [m.extract([i for i, z in enumerate(m.atomic_numbers)
                           if z > 1]) if (m.atomic_numbers == 1).any() else m
                for m in mols]
    return mols

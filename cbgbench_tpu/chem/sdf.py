"""SDF (MDL V2000) reader/writer, pure python.

Replaces RDKit's SDMolSupplier/SDWriter for the framework's IO needs
(reference reads ligands with RDKit at
repo/datasets/parsers/molecule_parser.py:17-90 and writes generated
molecules via Chem.MolToMolFile in sample.py:227).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..constants.molecule import (MAP_ATOMIC_NUMBER_TO_ATOM_SYMBOL,
                                  SYMBOL_TO_Z)
from .mol import Molecule


def _parse_block(block: str) -> Molecule:
    lines = block.split("\n")
    counts = lines[3]
    n_atoms = int(counts[0:3])
    n_bonds = int(counts[3:6])
    pos = np.zeros((n_atoms, 3))
    z = np.zeros(n_atoms, int)
    for i in range(n_atoms):
        ln = lines[4 + i]
        pos[i] = [float(ln[0:10]), float(ln[10:20]), float(ln[20:30])]
        sym = ln[31:34].strip()
        z[i] = SYMBOL_TO_Z.get(sym, SYMBOL_TO_Z.get(sym.capitalize(), 6))
    mol = Molecule(z, pos, name=lines[0].strip())
    for k in range(n_bonds):
        ln = lines[4 + n_atoms + k]
        i = int(ln[0:3]) - 1
        j = int(ln[3:6]) - 1
        order = int(ln[6:9])
        mol.add_bond(i, j, order)
    # aromatic flags: class-4 bonds AND Hückel perception of kekulized
    # rings (CrossDocked SDFs are kekulized; the reference's SanitizeMol
    # re-perceives aromaticity — see chem/aromatic.py)
    from .aromatic import perceive_aromatic
    mol.aromatic = perceive_aromatic(mol)
    return mol


def read_sdf(path: str, strict: bool = False) -> List[Molecule]:
    with open(path, "r") as f:
        lines = f.read().split("\n")
    mols = []
    block: List[str] = []
    for ln in lines:
        if ln.startswith("$$$$"):
            if any(s.strip() for s in block):
                try:
                    mols.append(_parse_block("\n".join(block)))
                except (ValueError, IndexError):
                    if strict:
                        raise
            block = []
        else:
            block.append(ln)
    if any(s.strip() for s in block):   # file without trailing $$$$
        try:
            mols.append(_parse_block("\n".join(block)))
        except (ValueError, IndexError):
            if strict:
                raise
    return mols


def mol_to_sdf_block(mol: Molecule, name: str | None = None) -> str:
    n, nb = mol.num_atoms, len(mol.bonds)
    lines = [name or mol.name or "mol", "  cbgbench-tpu 3D", "",
             f"{n:3d}{nb:3d}  0  0  0  0  0  0  0  0999 V2000"]
    syms = mol.symbols()
    for i in range(n):
        x, y, zc = mol.pos[i]
        lines.append(f"{x:10.4f}{y:10.4f}{zc:10.4f} {syms[i]:<3} 0  0  0  0  0  0  0  0  0  0  0  0")
    for (i, j), cls in sorted(mol.bonds.items()):
        lines.append(f"{i + 1:3d}{j + 1:3d}{cls:3d}  0")
    lines.append("M  END")
    lines.append("$$$$")
    return "\n".join(lines) + "\n"


def write_sdf(path: str, mols) -> None:
    if isinstance(mols, Molecule):
        mols = [mols]
    with open(path, "w") as f:
        for m in mols:
            f.write(mol_to_sdf_block(m))

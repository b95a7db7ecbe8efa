"""Point cloud -> molecule reconstruction + validity filtering.

Replaces the reference's OpenBabel/RDKit reconstruction path
(reference: repo/tools/rdkit_utils.py:522-641 reconstruct_mol +
evaluate_validity). If RDKit is importable the rdkit_bridge refines the
result (sanitization/kekulization); otherwise the pure-python pipeline in
chem.bonds provides connectivity, orders, and validity checks.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..constants.molecule import (get_atomic_number_from_index,
                                  is_aromatic_from_index)
from .bonds import perceive_bonds
from .mol import Molecule

from .rdkit_bridge import HAS_RDKIT


def reconstruct_molecule(pos: np.ndarray, atom_index: np.ndarray,
                         mode: str = "add_aromatic",
                         refine: bool = True) -> Molecule:
    """Generated (positions, class indices) -> bonded Molecule.

    ``atom_index`` are featurizer-mode class indices; mode determines the
    element / aromatic decoding (reference: sample.py:208-226). When RDKit
    is importable the result is refined through the reference's
    post-processing (rdkit_bridge.refine_molecule)."""
    atom_index = np.asarray(atom_index).reshape(-1)
    z = np.array(get_atomic_number_from_index(atom_index, mode))
    arom = is_aromatic_from_index(atom_index, mode)
    arom = np.asarray(arom, bool) if arom is not None else None
    mol = perceive_bonds(z, np.asarray(pos, float)[:len(z)], aromatic=arom)
    if refine and HAS_RDKIT:
        from .rdkit_bridge import refine_molecule
        mol = refine_molecule(mol)
    return mol


def largest_fragment(mol: Molecule) -> Molecule:
    comps = mol.fragments()
    if not comps:
        return mol
    return mol.extract(comps[0])


def evaluate_validity(mol: Molecule, min_atoms: int = 8,
                      frag_threshold: float = 0.8,
                      keep_largest: bool = True
                      ) -> Tuple[Optional[Molecule], bool]:
    """Validity rule mirroring the reference filter
    (rdkit_utils.py:615-641): take the largest fragment; it must hold at
    least ``frag_threshold`` of the atoms OR ``min_atoms`` atoms, and pass
    valence sanity. Returns (molecule-or-None, is_valid). With RDKit the
    reference's exact rule runs instead (rdkit_bridge.rdkit_validity)."""
    if mol.num_atoms == 0:
        return None, False
    if HAS_RDKIT:
        from .rdkit_bridge import rdkit_validity
        return rdkit_validity(mol, min_atoms=min_atoms,
                              frag_threshold=frag_threshold)
    frag = largest_fragment(mol) if keep_largest else mol
    size_ok = (frag.num_atoms >= min_atoms
               or frag.num_atoms >= frag_threshold * mol.num_atoms)
    if not size_ok:
        return None, False
    if not frag.valence_ok(slack=0.5):
        return None, False
    return frag, True

"""Host-side (numpy) featurizers: parsed molecules/pockets -> model arrays.

Mirrors the reference featurizer semantics
(reference: repo/datasets/transforms/molecule_featurizer.py:7-99,
protein_featurizer.py:7-43) without torch: the output dicts feed
data.batch.stack_batch directly.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..constants.molecule import (MAP_ATOM_TYPE_AROMATIC_TO_INDEX,
                                  MAP_ATOM_TYPE_FULL_TO_INDEX,
                                  MAP_ATOM_TYPE_ONLY_TO_INDEX)
from ..chem.mol import Molecule, bond_index_arrays
from ..chem.pdb import PocketAtoms
from ..constants.protein import POCKET_ATOMIC_NUMBERS

_POCKET_C_INDEX = POCKET_ATOMIC_NUMBERS.index(6)


def infer_hybridization(mol: Molecule):
    """Approximate per-atom hybridization from the bond graph (used when
    RDKit is unavailable; 'full' mode only). Aromatic atoms are SP2 —
    RDKit reports SP2 for lone-pair donors in aromatic rings (furan O,
    pyrrole N) that pure bond-order counting would call SP3."""
    arom = (mol.aromatic if mol.aromatic is not None
            else np.zeros(mol.num_atoms, bool))
    hyb = []
    for i in range(mol.num_atoms):
        orders = [cls for (a, b), cls in mol.bonds.items() if i in (a, b)]
        if 3 in orders or orders.count(2) >= 2:
            hyb.append("SP")
        elif 2 in orders or 4 in orders or bool(arom[i]):
            hyb.append("SP2")
        else:
            hyb.append("SP3")
    return hyb


def featurize_ligand(mol: Molecule, mode: str = "add_aromatic",
                     keep_bonds: bool = True) -> Dict[str, np.ndarray]:
    """-> {'pos', 'atype', 'bond_index', 'bond_type'} with class indices in
    the chosen mode's space. Unknown combos fall back to the plain-element
    class (reference raises; we degrade gracefully for generated mols)."""
    z = mol.atomic_numbers
    arom = (mol.aromatic if mol.aromatic is not None
            else np.zeros(mol.num_atoms, bool))
    atype = np.zeros(mol.num_atoms, np.int32)
    if mode == "basic":
        for i, zz in enumerate(z):
            atype[i] = MAP_ATOM_TYPE_ONLY_TO_INDEX.get(int(zz), 1)
    elif mode == "add_aromatic":
        for i, zz in enumerate(z):
            key = (int(zz), bool(arom[i]))
            if key not in MAP_ATOM_TYPE_AROMATIC_TO_INDEX:
                key = (int(zz), False)
            atype[i] = MAP_ATOM_TYPE_AROMATIC_TO_INDEX.get(key, 1)
    elif mode == "full":
        hyb = infer_hybridization(mol)
        for i, zz in enumerate(z):
            key = (int(zz), hyb[i], bool(arom[i]))
            if key not in MAP_ATOM_TYPE_FULL_TO_INDEX:
                key = (int(zz), "SP3", False)
            atype[i] = MAP_ATOM_TYPE_FULL_TO_INDEX.get(key, 4)
    else:
        raise ValueError(f"unknown mode {mode}")

    out = {"pos": np.asarray(mol.pos, np.float32), "atype": atype}
    if keep_bonds:
        bi, bt = bond_index_arrays(mol)
        out["bond_index"] = bi
        out["bond_type"] = bt
    return out


def featurize_protein(atoms: PocketAtoms) -> Dict[str, np.ndarray]:
    """-> {'pos', 'element', 'is_backbone', 'aa', 'is_alpha'} (indices, not
    one-hots; one-hot expansion happens on device in the embedder)."""
    return {
        "pos": np.asarray(atoms.pos, np.float32),
        "element": np.asarray(atoms.element_index, np.int32),
        "is_backbone": np.asarray(atoms.is_backbone, bool),
        "aa": np.asarray(atoms.atom_to_aa_type, np.int32),
        # alpha carbons anchor FLAG's structure-refinement pairs
        # (reference: utils/data.py protein_alpha_carbon_index); nameless
        # atoms fall back to backbone carbons (same as
        # flag_data._alpha_indices), not all backbone atoms
        "is_alpha": np.asarray([n == "CA" for n in atoms.atom_name], bool)
        if atoms.atom_name else (np.asarray(atoms.is_backbone, bool)
                                 & (np.asarray(atoms.element_index)
                                    == _POCKET_C_INDEX)),
    }

"""Small-molecule vocabularies and type maps.

These tables define the categorical class spaces of every generative model
(atom-type diffusion classes, bond classes, hybridizations). They must match
the reference vocabularies exactly for metric parity; see
``/root/reference/repo/utils/molecule/constants.py`` for the originals.
"""

from __future__ import annotations

import numpy as np

# H is the absorbing class for absorbing-state (masking) type diffusion:
# models only generate heavy atoms, so collapsing to "H" marks "masked".
# (reference: utils/molecule/constants.py:8)
ABSORBING_STATE = 0

ATOM_FAMILIES = [
    "Acceptor", "Donor", "Aromatic", "Hydrophobe", "LumpedHydrophobe",
    "NegIonizable", "PosIonizable", "ZnBinder",
]
ATOM_FAMILIES_ID = {s: i for i, s in enumerate(ATOM_FAMILIES)}

# Bond classes: 0 is "none/unspecified" so bond-type predictors can use class 0
# as the no-bond class. (reference: constants.py:13-19)
BOND_NONE, BOND_SINGLE, BOND_DOUBLE, BOND_TRIPLE, BOND_AROMATIC = range(5)
BOND_NAMES = {0: "UNSPECIFIED", 1: "SINGLE", 2: "DOUBLE", 3: "TRIPLE", 4: "AROMATIC"}
NUM_BOND_TYPES = 5

HYBRIDIZATION_TYPES = ["S", "SP", "SP2", "SP3", "SP3D", "SP3D2"]
HYBRIDIZATION_TYPE_ID = {s: i for i, s in enumerate(HYBRIDIZATION_TYPES)}

AROMATIC_FEAT_MAP_IDX = ATOM_FAMILIES_ID["Aromatic"]

# ---------------------------------------------------------------------------
# Atom-type class maps. Three featurization modes ("basic", "add_aromatic",
# "full") index atoms into 8 / 13 / 23 classes. Only atomic numbers
# {1, 6, 7, 8, 9, 15, 16, 17} occur in CrossDocked ligands.
# (reference: constants.py:28-79)
# ---------------------------------------------------------------------------

# mode="full": (atomic number, hybridization, is_aromatic) -> class
MAP_ATOM_TYPE_FULL_TO_INDEX = {
    (1, "S", False): 0,
    (6, "SP", False): 1,
    (6, "SP2", False): 2,
    (6, "SP2", True): 3,
    (6, "SP3", False): 4,
    (7, "SP", False): 5,
    (7, "SP2", False): 6,
    (7, "SP2", True): 7,
    (7, "SP3", False): 8,
    (8, "SP2", False): 9,
    (8, "SP2", True): 10,
    (8, "SP3", False): 11,
    (9, "SP3", False): 12,
    (15, "SP2", False): 13,
    (15, "SP2", True): 14,
    (15, "SP3", False): 15,
    (15, "SP3D", False): 16,
    (16, "SP2", False): 17,
    (16, "SP2", True): 18,
    (16, "SP3", False): 19,
    (16, "SP3D", False): 20,
    (16, "SP3D2", False): 21,
    (17, "SP3", False): 22,
}

# mode="basic": atomic number -> class
MAP_ATOM_TYPE_ONLY_TO_INDEX = {1: 0, 6: 1, 7: 2, 8: 3, 9: 4, 15: 5, 16: 6, 17: 7}

# mode="add_aromatic": (atomic number, is_aromatic) -> class
MAP_ATOM_TYPE_AROMATIC_TO_INDEX = {
    (1, False): 0,
    (6, False): 1,
    (6, True): 2,
    (7, False): 3,
    (7, True): 4,
    (8, False): 5,
    (8, True): 6,
    (9, False): 7,
    (15, False): 8,
    (15, True): 9,
    (16, False): 10,
    (16, True): 11,
    (17, False): 12,
}

MAP_INDEX_TO_ATOM_TYPE_ONLY = {v: k for k, v in MAP_ATOM_TYPE_ONLY_TO_INDEX.items()}
MAP_INDEX_TO_ATOM_TYPE_AROMATIC = {v: k for k, v in MAP_ATOM_TYPE_AROMATIC_TO_INDEX.items()}
MAP_INDEX_TO_ATOM_TYPE_FULL = {v: k for k, v in MAP_ATOM_TYPE_FULL_TO_INDEX.items()}

NUM_ATOM_TYPES_BY_MODE = {
    "basic": len(MAP_ATOM_TYPE_ONLY_TO_INDEX),          # 8
    "add_aromatic": len(MAP_ATOM_TYPE_AROMATIC_TO_INDEX),  # 13
    "full": len(MAP_ATOM_TYPE_FULL_TO_INDEX),           # 23
}


def atom_class_index(atomic_number: int, hybridization: str, is_aromatic: bool,
                     mode: str) -> int:
    """Map raw atom properties -> featurization class index for a given mode."""
    if mode == "basic":
        return MAP_ATOM_TYPE_ONLY_TO_INDEX[atomic_number]
    if mode == "add_aromatic":
        return MAP_ATOM_TYPE_AROMATIC_TO_INDEX[(atomic_number, bool(is_aromatic))]
    if mode == "full":
        return MAP_ATOM_TYPE_FULL_TO_INDEX[(atomic_number, hybridization, bool(is_aromatic))]
    raise ValueError(f"unknown featurize mode: {mode}")


def get_atomic_number_from_index(index, mode: str):
    """Class indices -> atomic numbers (vectorized over a sequence)."""
    idx = np.asarray(index).reshape(-1).tolist()
    if mode == "basic":
        return [MAP_INDEX_TO_ATOM_TYPE_ONLY[i] for i in idx]
    if mode == "add_aromatic":
        return [MAP_INDEX_TO_ATOM_TYPE_AROMATIC[i][0] for i in idx]
    if mode == "full":
        return [MAP_INDEX_TO_ATOM_TYPE_FULL[i][0] for i in idx]
    raise ValueError(f"unknown featurize mode: {mode}")


def is_aromatic_from_index(index, mode: str):
    idx = np.asarray(index).reshape(-1).tolist()
    if mode == "add_aromatic":
        return [MAP_INDEX_TO_ATOM_TYPE_AROMATIC[i][1] for i in idx]
    if mode == "full":
        return [MAP_INDEX_TO_ATOM_TYPE_FULL[i][2] for i in idx]
    if mode == "basic":
        return None
    raise ValueError(f"unknown featurize mode: {mode}")


SINGLE_ATOM_SYMBOLS = ["O", "C", "N", "F", "Cl", "Br", "S", "I", "P", "B"]
MAP_ATOM_SYMBOL_TO_ATOMIC_NUMBER = {
    "H": 1, "C": 6, "N": 7, "O": 8, "F": 9, "P": 15, "S": 16, "Cl": 17,
}
MAP_ATOMIC_NUMBER_TO_ATOM_SYMBOL = {
    v: k for k, v in MAP_ATOM_SYMBOL_TO_ATOMIC_NUMBER.items()
}

# Extended periodic-table symbols used by the pure-python SDF/PDB parsers and
# the host-side bond-perception code (not a class vocabulary).
PT_SYMBOLS = [
    "X", "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne", "Na", "Mg",
    "Al", "Si", "P", "S", "Cl", "Ar", "K", "Ca", "Sc", "Ti", "V", "Cr", "Mn",
    "Fe", "Co", "Ni", "Cu", "Zn", "Ga", "Ge", "As", "Se", "Br", "Kr", "Rb",
    "Sr", "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd", "In",
    "Sn", "Sb", "Te", "I", "Xe",
]
SYMBOL_TO_Z = {s: i for i, s in enumerate(PT_SYMBOLS)}
SYMBOL_TO_Z.update({s.upper(): i for i, s in enumerate(PT_SYMBOLS)})

# Covalent radii (Å), Cordero et al. 2008 values, indexed by atomic number.
# Used by host-side distance-based bond perception (the openbabel
# connect_the_dots replacement, reference: tools/rdkit_utils.py:78-196).
COVALENT_RADII = {
    1: 0.31, 5: 0.84, 6: 0.76, 7: 0.71, 8: 0.66, 9: 0.57, 14: 1.11, 15: 1.07,
    16: 1.05, 17: 1.02, 34: 1.20, 35: 1.20, 53: 1.39, 12: 1.41, 20: 1.76,
    26: 1.32, 30: 1.22, 11: 1.66, 19: 2.03, 25: 1.39, 29: 1.32,
}

# Maximum valences for bond perception / stability checks.
MAX_VALENCE = {1: 1, 5: 3, 6: 4, 7: 3, 8: 2, 9: 1, 14: 4, 15: 5, 16: 6,
               17: 1, 35: 1, 53: 1, 34: 2}

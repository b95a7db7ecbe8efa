"""Protein residue/atom vocabularies.

Class spaces for receptor featurization (amino-acid types, pocket atom
elements, per-residue heavy-atom layout, chi-angle definitions). Must match
the reference tables for parity; see
``/root/reference/repo/utils/protein/constants.py``.
"""

from __future__ import annotations

import enum

RESSYMB_TO_RESINDEX = {
    "A": 0, "C": 1, "D": 2, "E": 3, "F": 4,
    "G": 5, "H": 6, "I": 7, "K": 8, "L": 9,
    "M": 10, "N": 11, "P": 12, "Q": 13, "R": 14,
    "S": 15, "T": 16, "V": 17, "W": 18, "Y": 19,
    "X": 20,
}

AA_NAME_SYM = {
    "ALA": "A", "CYS": "C", "ASP": "D", "GLU": "E", "PHE": "F", "GLY": "G",
    "HIS": "H", "ILE": "I", "LYS": "K", "LEU": "L", "MET": "M", "ASN": "N",
    "PRO": "P", "GLN": "Q", "ARG": "R", "SER": "S", "THR": "T", "VAL": "V",
    "TRP": "W", "TYR": "Y",
}
AA_NAME_NUMBER = {k: i for i, (k, _) in enumerate(AA_NAME_SYM.items())}
NUM_AA_NAMES = len(AA_NAME_NUMBER)  # 20 (one-hot dim used by PLContextEmbedder)

# Pocket atom elements that occur in CrossDocked receptor shells (H,C,N,O,S,Se).
# One-hot dim for protein atom featurization is len+1 (+is_backbone bit).
# (reference: utils/protein/constants.py:36)
POCKET_ATOMIC_NUMBERS = [1, 6, 7, 8, 16, 34]
NUM_POCKET_ATOM_FEAT = len(POCKET_ATOMIC_NUMBERS) + 1

BACKBONE_NAMES = ["CA", "C", "N", "O"]

# Mapping PDB 3-letter codes of modified residues to their standard parent.
NON_STANDARD_SUBSTITUTIONS = {
    "2AS": "ASP", "3AH": "HIS", "5HP": "GLU", "ACL": "ARG", "AGM": "ARG",
    "AIB": "ALA", "ALM": "ALA", "ALO": "THR", "ALY": "LYS", "ARM": "ARG",
    "ASA": "ASP", "ASB": "ASP", "ASK": "ASP", "ASL": "ASP", "ASQ": "ASP",
    "AYA": "ALA", "BCS": "CYS", "BHD": "ASP", "BMT": "THR", "BNN": "ALA",
    "BUC": "CYS", "BUG": "LEU", "C5C": "CYS", "C6C": "CYS", "CAS": "CYS",
    "CCS": "CYS", "CEA": "CYS", "CGU": "GLU", "CHG": "ALA", "CLE": "LEU",
    "CME": "CYS", "CSD": "ALA", "CSO": "CYS", "CSP": "CYS", "CSS": "CYS",
    "CSW": "CYS", "CSX": "CYS", "CXM": "MET", "CY1": "CYS", "CY3": "CYS",
    "CYG": "CYS", "CYM": "CYS", "CYQ": "CYS", "DAH": "PHE", "DAL": "ALA",
    "DAR": "ARG", "DAS": "ASP", "DCY": "CYS", "DGL": "GLU", "DGN": "GLN",
    "DHA": "ALA", "DHI": "HIS", "DIL": "ILE", "DIV": "VAL", "DLE": "LEU",
    "DLY": "LYS", "DNP": "ALA", "DPN": "PHE", "DPR": "PRO", "DSN": "SER",
    "DSP": "ASP", "DTH": "THR", "DTR": "TRP", "DTY": "TYR", "DVA": "VAL",
    "EFC": "CYS", "FLA": "ALA", "FME": "MET", "GGL": "GLU", "GL3": "GLY",
    "GLZ": "GLY", "GMA": "GLU", "GSC": "GLY", "HAC": "ALA", "HAR": "ARG",
    "HIC": "HIS", "HIP": "HIS", "HMR": "ARG", "HPQ": "PHE", "HTR": "TRP",
    "HYP": "PRO", "IAS": "ASP", "IIL": "ILE", "IYR": "TYR", "KCX": "LYS",
    "LLP": "LYS", "LLY": "LYS", "LTR": "TRP", "LYM": "LYS", "LYZ": "LYS",
    "MAA": "ALA", "MEN": "ASN", "MHS": "HIS", "MIS": "SER", "MLE": "LEU",
    "MPQ": "GLY", "MSA": "GLY", "MSE": "MET", "MVA": "VAL", "NEM": "HIS",
    "NEP": "HIS", "NLE": "LEU", "NLN": "LEU", "NLP": "LEU", "NMC": "GLY",
    "OAS": "SER", "OCS": "CYS", "OMT": "MET", "PAQ": "TYR", "PCA": "GLU",
    "PEC": "CYS", "PHI": "PHE", "PHL": "PHE", "PR3": "CYS", "PRR": "ALA",
    "PTR": "TYR", "PYX": "CYS", "SAC": "SER", "SAR": "GLY", "SCH": "CYS",
    "SCS": "CYS", "SCY": "CYS", "SEL": "SER", "SEP": "SER", "SET": "SER",
    "SHC": "CYS", "SHR": "LYS", "SMC": "CYS", "SOC": "CYS", "STY": "TYR",
    "SVA": "SER", "TIH": "ALA", "TPL": "TRP", "TPO": "THR", "TPQ": "ALA",
    "TRG": "LYS", "TRO": "TRP", "TYB": "TYR", "TYI": "TYR", "TYQ": "TYR",
    "TYS": "TYR", "TYY": "TYR",
}


class AA(enum.IntEnum):
    ALA = 0; CYS = 1; ASP = 2; GLU = 3; PHE = 4          # noqa: E702
    GLY = 5; HIS = 6; ILE = 7; LYS = 8; LEU = 9          # noqa: E702
    MET = 10; ASN = 11; PRO = 12; GLN = 13; ARG = 14     # noqa: E702
    SER = 15; THR = 16; VAL = 17; TRP = 18; TYR = 19     # noqa: E702
    UNK = 20

    @classmethod
    def from_str(cls, value: str) -> "AA":
        if len(value) == 3:
            value = NON_STANDARD_SUBSTITUTIONS.get(value, value)
            if value in cls._member_names_:
                return getattr(cls, value)
            return cls.UNK
        if len(value) == 1 and value in RESSYMB_TO_RESINDEX:
            return cls(RESSYMB_TO_RESINDEX[value])
        return cls.UNK

    @classmethod
    def is_aa(cls, value: str) -> bool:
        return (value in RESSYMB_TO_RESINDEX or value in NON_STANDARD_SUBSTITUTIONS
                or value in cls._member_names_)


NUM_AA_TYPES = len(AA)  # 21


class BBHeavyAtom(enum.IntEnum):
    N = 0; CA = 1; C = 2; O = 3; CB = 4; OXT = 14  # noqa: E702


MAX_NUM_HEAVYATOMS = 15
MAX_NUM_HYDROGENS = 16
MAX_NUM_ALLATOMS = MAX_NUM_HEAVYATOMS + MAX_NUM_HYDROGENS

RESTYPE_TO_HEAVYATOM_NAMES = {
    AA.ALA: ["N", "CA", "C", "O", "CB", "", "", "", "", "", "", "", "", "", "OXT"],
    AA.ARG: ["N", "CA", "C", "O", "CB", "CG", "CD", "NE", "CZ", "NH1", "NH2", "", "", "", "OXT"],
    AA.ASN: ["N", "CA", "C", "O", "CB", "CG", "OD1", "ND2", "", "", "", "", "", "", "OXT"],
    AA.ASP: ["N", "CA", "C", "O", "CB", "CG", "OD1", "OD2", "", "", "", "", "", "", "OXT"],
    AA.CYS: ["N", "CA", "C", "O", "CB", "SG", "", "", "", "", "", "", "", "", "OXT"],
    AA.GLN: ["N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "NE2", "", "", "", "", "", "OXT"],
    AA.GLU: ["N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "OE2", "", "", "", "", "", "OXT"],
    AA.GLY: ["N", "CA", "C", "O", "", "", "", "", "", "", "", "", "", "", "OXT"],
    AA.HIS: ["N", "CA", "C", "O", "CB", "CG", "ND1", "CD2", "CE1", "NE2", "", "", "", "", "OXT"],
    AA.ILE: ["N", "CA", "C", "O", "CB", "CG1", "CG2", "CD1", "", "", "", "", "", "", "OXT"],
    AA.LEU: ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "", "", "", "", "", "", "OXT"],
    AA.LYS: ["N", "CA", "C", "O", "CB", "CG", "CD", "CE", "NZ", "", "", "", "", "", "OXT"],
    AA.MET: ["N", "CA", "C", "O", "CB", "CG", "SD", "CE", "", "", "", "", "", "", "OXT"],
    AA.PHE: ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ", "", "", "", "OXT"],
    AA.PRO: ["N", "CA", "C", "O", "CB", "CG", "CD", "", "", "", "", "", "", "", "OXT"],
    AA.SER: ["N", "CA", "C", "O", "CB", "OG", "", "", "", "", "", "", "", "", "OXT"],
    AA.THR: ["N", "CA", "C", "O", "CB", "OG1", "CG2", "", "", "", "", "", "", "", "OXT"],
    AA.TRP: ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "NE1", "CE2", "CE3", "CZ2", "CZ3", "CH2", "OXT"],
    AA.TYR: ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ", "OH", "", "", "OXT"],
    AA.VAL: ["N", "CA", "C", "O", "CB", "CG1", "CG2", "", "", "", "", "", "", "", "OXT"],
    AA.UNK: ["", "", "", "", "", "", "", "", "", "", "", "", "", "", ""],
}

CHI_ANGLES_ATOMS = {
    AA.ALA: [],
    AA.ARG: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD"],
             ["CB", "CG", "CD", "NE"], ["CG", "CD", "NE", "CZ"]],
    AA.ASN: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "OD1"]],
    AA.ASP: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "OD1"]],
    AA.CYS: [["N", "CA", "CB", "SG"]],
    AA.GLN: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD"],
             ["CB", "CG", "CD", "OE1"]],
    AA.GLU: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD"],
             ["CB", "CG", "CD", "OE1"]],
    AA.GLY: [],
    AA.HIS: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "ND1"]],
    AA.ILE: [["N", "CA", "CB", "CG1"], ["CA", "CB", "CG1", "CD1"]],
    AA.LEU: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD1"]],
    AA.LYS: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD"],
             ["CB", "CG", "CD", "CE"], ["CG", "CD", "CE", "NZ"]],
    AA.MET: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "SD"],
             ["CB", "CG", "SD", "CE"]],
    AA.PHE: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD1"]],
    AA.PRO: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD"]],
    AA.SER: [["N", "CA", "CB", "OG"]],
    AA.THR: [["N", "CA", "CB", "OG1"]],
    AA.TRP: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD1"]],
    AA.TYR: [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD1"]],
    AA.VAL: [["N", "CA", "CB", "CG1"]],
}

NUM_CHI_ANGLES = {k: len(v) for k, v in CHI_ANGLES_ATOMS.items()}

CHI_PI_PERIODIC = {
    AA.ASP: [False, True, False, False],
    AA.GLU: [False, False, True, False],
    AA.PHE: [False, True, False, False],
    AA.TYR: [False, True, False, False],
}

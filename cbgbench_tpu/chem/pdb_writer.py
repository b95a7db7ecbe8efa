"""Minimal PDB writer (reference: repo/utils/protein/writers.py:10-67)."""

from __future__ import annotations

import numpy as np

from ..constants.protein import AA, RESTYPE_TO_HEAVYATOM_NAMES


def write_pocket_pdb(path: str, residues) -> None:
    """PocketResidues -> PDB text (heavy atoms with known slots)."""
    lines = []
    serial = 1
    for r in range(len(residues.aa)):
        aa = AA(int(residues.aa[r]))
        names = RESTYPE_TO_HEAVYATOM_NAMES.get(aa, [""] * 15)
        for s, name in enumerate(names):
            if not name or not residues.mask_heavyatom[r, s]:
                continue
            x, y, z = residues.pos_heavyatom[r, s]
            elem = name[0]
            chain = chr(ord("A") + int(residues.chain_nb[r]) % 26)
            # strict PDB columns: name 13-16, altLoc 17, resName 18-20,
            # chain 22, resSeq 23-26, iCode 27, coords 31-54, element 77-78
            lines.append(
                "ATOM  " + f"{serial % 100000:5d}" + " "
                + f"{name:<4}" + " " + f"{aa.name:>3}" + " " + chain
                + f"{int(residues.res_nb[r]) % 10000:4d}" + " " + "   "
                + f"{x:8.3f}{y:8.3f}{z:8.3f}"
                + "  1.00  0.00          " + f"{elem:>2}")
            serial += 1
    lines.append("END")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

"""Protein-ligand interaction profiling.

Two paths:
 * PLIP (exact reference behavior, reference: repo/tools/interaction.py:
   47-110): merge ligand+pocket into one PDB, run the plip CLI, parse the
   XML report into per-type counts. Gated on the plip binary.
 * Geometric fallback (always available): distance/angle rules for
   hydrophobic contacts, hydrogen bonds, and halogen bonds — the three
   dominant types in CBGBench's interaction tables — so interaction JSD/MAE
   can be tracked without PLIP.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from collections import Counter
from typing import Dict

import numpy as np

from ..chem.mol import Molecule

INTERACTION_TYPES = ["hydrophobic", "hbond", "waterbridge", "pistack",
                     "pication", "halogen", "metal"]


def plip_available() -> bool:
    return shutil.which("plip") is not None


def plip_analysis(mol: Molecule, protein_pdb: str) -> Dict[str, int]:
    """Exact path via the PLIP command line (requires plip+openbabel)."""
    from ..chem.sdf import write_sdf
    import xml.etree.ElementTree as ET

    with tempfile.TemporaryDirectory() as tmp:
        lig_sdf = os.path.join(tmp, "lig.sdf")
        write_sdf(lig_sdf, mol)
        complex_pdb = os.path.join(tmp, "complex.pdb")
        _merge_into_pdb(mol, protein_pdb, complex_pdb)
        subprocess.run(["plip", "-f", complex_pdb, "-x", "-o", tmp],
                       check=True, capture_output=True)
        tree = ET.parse(os.path.join(tmp, "report.xml"))
        counts = Counter()
        tag_map = {"hydrophobic_interaction": "hydrophobic",
                   "hydrogen_bond": "hbond", "water_bridge": "waterbridge",
                   "pi_stack": "pistack", "pi_cation_interaction": "pication",
                   "halogen_bond": "halogen", "metal_complex": "metal"}
        for xml_tag, name in tag_map.items():
            counts[name] = len(tree.getroot().iter(xml_tag.rstrip("s")))
        return {k: counts.get(k, 0) for k in INTERACTION_TYPES}


def _merge_into_pdb(mol: Molecule, protein_pdb: str, out_path: str):
    lines = [l for l in open(protein_pdb)
             if l.startswith(("ATOM", "HETATM", "TER"))]
    syms = mol.symbols()
    for i in range(mol.num_atoms):
        x, y, z = mol.pos[i]
        lines.append(
            f"HETATM{i + 1:5d} {syms[i]:<4}LIG L 999    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00          {syms[i]:>2}\n")
    lines.append("END\n")
    with open(out_path, "w") as f:
        f.writelines(lines)


# ---------------------------------------------------------------------------
# geometric fallback
# ---------------------------------------------------------------------------

def geometric_interactions(mol: Molecule, protein_pos, protein_elements,
                           protein_is_backbone=None) -> Dict[str, int]:
    """Rule-based contacts: hydrophobic C...C within 4.0 Å; donor/acceptor
    N/O...N/O within 3.5 Å (hbond proxy); halogen X...O/N within 3.5 Å."""
    p_pos = np.asarray(protein_pos)
    p_el = np.asarray(protein_elements)
    d = np.linalg.norm(mol.pos[:, None] - p_pos[None], axis=-1)
    lz = mol.atomic_numbers

    counts = {k: 0 for k in INTERACTION_TYPES}
    lig_c = lz == 6
    rec_c = p_el == 6
    counts["hydrophobic"] = int(((d < 4.0)
                                 & lig_c[:, None] & rec_c[None]).sum())
    lig_don = np.isin(lz, (7, 8))
    rec_don = np.isin(p_el, (7, 8))
    counts["hbond"] = int(((d < 3.5) & lig_don[:, None] & rec_don[None]).sum())
    lig_hal = np.isin(lz, (9, 17, 35, 53))
    counts["halogen"] = int(((d < 3.5)
                             & lig_hal[:, None] & rec_don[None]).sum())
    return counts


def analyze_interactions(mol: Molecule, protein_pdb: str = None,
                         protein_pos=None, protein_elements=None
                         ) -> Dict[str, int]:
    if plip_available() and protein_pdb is not None:
        try:
            return plip_analysis(mol, protein_pdb)
        except Exception:
            pass
    if protein_pos is None and protein_pdb is not None:
        from ..chem.pdb import parse_pdb_pocket
        atoms, _ = parse_pdb_pocket(protein_pdb)
        protein_pos, protein_elements = atoms.pos, atoms.element
    return geometric_interactions(mol, protein_pos, protein_elements)

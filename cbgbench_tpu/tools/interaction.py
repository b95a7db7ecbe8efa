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
            # iter() returns a generator — len() on it raises TypeError,
            # which the caller's fallback swallowed, silently masking PLIP
            counts[name] = sum(1 for _ in tree.getroot().iter(xml_tag))
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
# geometric fallback — PLIP-style rules for all 7 interaction types
# (distance/angle cutoffs follow PLIP's published defaults)
# ---------------------------------------------------------------------------

# side-chain ring atom names per aromatic residue (for π-stack / π-cation)
_AROMATIC_RING_ATOMS = {
    "PHE": ("CG", "CD1", "CD2", "CE1", "CE2", "CZ"),
    "TYR": ("CG", "CD1", "CD2", "CE1", "CE2", "CZ"),
    "TRP": ("CD2", "CE2", "CE3", "CZ2", "CZ3", "CH2"),
    "HIS": ("CG", "ND1", "CD2", "CE1", "NE2"),
}
# cationic side-chain centers
_CATION_ATOMS = {"ARG": ("CZ",), "LYS": ("NZ",), "HIS": ("CE1",)}
_METAL_SYMBOLS = {"ZN", "MG", "MN", "CA", "FE", "NA", "K", "CU", "NI", "CO",
                  "CD", "HG"}


def _ring_plane(pos: np.ndarray):
    """Centroid + unit normal of a set of ring-atom coordinates (SVD)."""
    centroid = pos.mean(0)
    _, _, vt = np.linalg.svd(pos - centroid)
    return centroid, vt[2]


def _ligand_rings(mol: Molecule):
    """Aromatic ring (centroid, normal) pairs of the ligand: rings of size
    5/6 whose atoms are flagged aromatic (or carry aromatic bonds)."""
    out = []
    for ring in mol.rings():
        if not 5 <= len(ring) <= 6:
            continue
        if mol.aromatic is not None:
            if not np.asarray(mol.aromatic)[ring].mean() >= 0.5:
                continue
        else:
            ring_set = set(ring)
            n_arom = sum(1 for (i, j), c in mol.bonds.items()
                         if c == 4 and i in ring_set and j in ring_set)
            if n_arom < len(ring) - 1:
                continue
        out.append(_ring_plane(mol.pos[ring]))
    return out


def _protein_rings_and_cations(atoms):
    """(rings, cations) from a PocketAtoms object via residue atom names."""
    from ..constants.protein import AA
    rings, cations = [], []
    if atoms is None or atoms.res_id is None or not atoms.atom_name:
        return rings, cations
    names = np.asarray(atoms.atom_name)
    for rid in np.unique(atoms.res_id):
        sel = atoms.res_id == rid
        aa = AA(int(atoms.atom_to_aa_type[sel][0]))
        resname = aa.name
        ring_names = _AROMATIC_RING_ATOMS.get(resname)
        if ring_names is not None:
            idx = np.flatnonzero(sel & np.isin(names, ring_names))
            if len(idx) >= len(ring_names) - 1:
                rings.append(_ring_plane(atoms.pos[idx]))
        for cn in _CATION_ATOMS.get(resname, ()):
            idx = np.flatnonzero(sel & (names == cn))
            if len(idx) and resname != "HIS":   # HIS+ needs protonation info
                cations.append(atoms.pos[idx[0]])
    return rings, cations


_WATER_METAL_CACHE: dict = {}


def _scan_waters_and_metals(protein_pdb: str):
    """Water oxygens + metal ions from the raw PDB text (parse_pdb_pocket
    drops both — waters lack frames, metals aren't pocket element types).
    Cached per path: the caller runs once per generated molecule (~100x
    per pocket) against an invariant protein file."""
    if protein_pdb in _WATER_METAL_CACHE:
        return _WATER_METAL_CACHE[protein_pdb]
    waters, metals = [], []
    try:
        with open(protein_pdb) as f:
            for line in f:
                if not line.startswith(("ATOM", "HETATM")):
                    continue
                resname = line[17:20].strip()
                elem = line[76:78].strip().upper() if len(line) >= 78 else ""
                try:
                    xyz = (float(line[30:38]), float(line[38:46]),
                           float(line[46:54]))
                except ValueError:
                    continue
                if resname in ("HOH", "WAT") and elem in ("O", ""):
                    waters.append(xyz)
                elif elem in _METAL_SYMBOLS or resname in _METAL_SYMBOLS:
                    metals.append(xyz)
    except OSError:
        pass
    out = (np.asarray(waters).reshape(-1, 3),
           np.asarray(metals).reshape(-1, 3))
    if len(_WATER_METAL_CACHE) > 64:    # bounded: one entry per pocket
        _WATER_METAL_CACHE.clear()
    _WATER_METAL_CACHE[protein_pdb] = out
    return out


def geometric_interactions(mol: Molecule, protein_pos, protein_elements,
                           atoms=None, protein_pdb: str = None
                           ) -> Dict[str, int]:
    """Rule-based profile of all 7 PLIP interaction types:
      hydrophobic  C...C < 4.0 Å
      hbond        N/O...N/O < 3.5 Å
      halogen      F/Cl/Br/I...O/N < 3.5 Å
      pistack      ring centroids < 5.5 Å, planar angle < 30° or > 60°
      pication     ring centroid...cation < 6.0 Å (either direction)
      waterbridge  water O within 3.5 Å of both a ligand and protein N/O
      metal        metal ion within 3.0 Å of a ligand N/O/S
    """
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

    lig_rings = _ligand_rings(mol)
    rec_rings, rec_cations = _protein_rings_and_cations(atoms)
    for lc, ln in lig_rings:
        for rc, rn in rec_rings:
            if np.linalg.norm(lc - rc) < 5.5:
                ang = np.degrees(np.arccos(np.clip(abs(np.dot(ln, rn)),
                                                   0, 1)))
                if ang < 30.0 or ang > 60.0:
                    counts["pistack"] += 1
        for cat in rec_cations:
            if np.linalg.norm(lc - np.asarray(cat)) < 6.0:
                counts["pication"] += 1
    # ligand cations (charged N with 4 bonds) vs protein rings
    for i in np.flatnonzero(lz == 7):
        if mol.degree(int(i)) >= 4:
            for rc, rn in rec_rings:
                if np.linalg.norm(mol.pos[i] - rc) < 6.0:
                    counts["pication"] += 1

    if protein_pdb:
        waters, metals = _scan_waters_and_metals(protein_pdb)
        if len(waters):
            dw_l = np.linalg.norm(mol.pos[:, None] - waters[None], axis=-1)
            dw_p = np.linalg.norm(p_pos[:, None] - waters[None], axis=-1)
            lig_near = (dw_l < 3.5) & lig_don[:, None]
            rec_near = (dw_p < 3.5) & rec_don[:, None]
            counts["waterbridge"] = int(
                (lig_near.any(0) & rec_near.any(0)).sum())
        if len(metals):
            dm = np.linalg.norm(mol.pos[:, None] - metals[None], axis=-1)
            lig_coord = np.isin(lz, (7, 8, 16))
            counts["metal"] = int(((dm < 3.0) & lig_coord[:, None]).sum())
    return counts


def analyze_interactions(mol: Molecule, protein_pdb: str = None,
                         protein_pos=None, protein_elements=None,
                         atoms=None) -> Dict[str, int]:
    if plip_available() and protein_pdb is not None:
        try:
            return plip_analysis(mol, protein_pdb)
        except Exception:
            pass
    if protein_pos is None and protein_pdb is not None:
        from ..chem.pdb import parse_pdb_pocket
        atoms, _ = parse_pdb_pocket(protein_pdb)
        protein_pos, protein_elements = atoms.pos, atoms.element
    return geometric_interactions(mol, protein_pos, protein_elements,
                                  atoms=atoms, protein_pdb=protein_pdb)

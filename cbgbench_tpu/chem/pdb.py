"""PDB pocket parser, pure python.

Replaces the reference's PDBProteinFA (Biopython-free full-atom parse,
repo/datasets/parsers/protein_parser.py:36-178): per-atom element, position,
backbone flag, parent-residue class, plus residue tables for frame models.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..constants.protein import (AA, BACKBONE_NAMES, MAX_NUM_HEAVYATOMS,
                                 POCKET_ATOMIC_NUMBERS,
                                 RESTYPE_TO_HEAVYATOM_NAMES)

_ELEMENT_Z = {"H": 1, "C": 6, "N": 7, "O": 8, "S": 16, "SE": 34, "Se": 34}
_POCKET_Z_INDEX = {z: i for i, z in enumerate(POCKET_ATOMIC_NUMBERS)}


@dataclass
class PocketAtoms:
    element: np.ndarray        # [N] atomic number
    element_index: np.ndarray  # [N] index into POCKET_ATOMIC_NUMBERS
    pos: np.ndarray            # [N, 3]
    is_backbone: np.ndarray    # [N] bool
    atom_to_aa_type: np.ndarray  # [N] residue class of parent residue
    atom_name: List[str] = field(default_factory=list)
    res_id: Optional[np.ndarray] = None   # [N] residue ordinal


@dataclass
class PocketResidues:
    aa: np.ndarray             # [R]
    pos_heavyatom: np.ndarray  # [R, 15, 3]
    mask_heavyatom: np.ndarray  # [R, 15] bool
    res_nb: np.ndarray         # [R]
    chain_nb: np.ndarray       # [R]


def _scan_pdb_python(text: str):
    """Pure-python column scan -> (z, pos, name, resname, chain, resseq,
    icode) tuples (fallback for the native fast path)."""
    atoms = []
    for line in text.split("\n"):
        if not (line.startswith("ATOM") or line.startswith("HETATM")):
            continue
        altloc = line[16]
        if altloc not in (" ", "A"):
            continue
        name = line[12:16].strip()
        resname = line[17:20].strip()
        chain = line[21]
        resseq = line[22:26].strip()
        icode = line[26]
        try:
            pos = (float(line[30:38]), float(line[38:46]), float(line[46:54]))
        except ValueError:
            continue
        elem = line[76:78].strip() if len(line) >= 78 else ""
        if not elem:
            elem = name[0]
        z = _ELEMENT_Z.get(elem.upper().capitalize(),
                           _ELEMENT_Z.get(elem.upper(), 0))
        if z in (0, 1):   # skip hydrogens/unknowns
            continue
        atoms.append((z, pos, name, resname, chain, resseq, icode))
    return atoms


_SLOT_CACHE: Dict[tuple, int] = {}


def _slot_of(aa: int, name: str) -> int:
    """Heavy-atom slot of (residue class, atom name); -1 if none."""
    if not _SLOT_CACHE:
        for aa_k, heavy in RESTYPE_TO_HEAVYATOM_NAMES.items():
            for s, nm in enumerate(heavy):
                if nm:
                    _SLOT_CACHE[(int(aa_k), nm)] = s
        _SLOT_CACHE[(-1, "")] = -1
    return _SLOT_CACHE.get((aa, name), -1)


def _assemble_native(cols):
    """Vectorized assembly from native parser columns (same outputs as the
    tuple path; the per-atom python loop is the old bottleneck)."""
    keep = np.isin(cols["z"], sorted(set(_ELEMENT_Z.values()) - {1}))
    if not keep.all():
        idx = np.flatnonzero(keep)
        for k in ("z", "pos", "is_backbone", "res_id", "resseq"):
            cols[k] = cols[k][idx]
        cols["names"] = [cols["names"][i] for i in idx]
        cols["resnames"] = [cols["resnames"][i] for i in idx]
        cols["chains"] = [cols["chains"][i] for i in idx]
        # re-densify residue ordinals
        _, cols["res_id"] = np.unique(cols["res_id"], return_inverse=True)
    order = np.argsort(cols["res_id"], kind="stable")
    el = cols["z"][order].astype(int)
    pos = cols["pos"][order]
    bb = cols["is_backbone"][order]
    rid = cols["res_id"][order]
    names = [cols["names"][i] for i in order]
    n_res = int(rid[-1]) + 1 if len(rid) else 0
    starts = np.searchsorted(rid, np.arange(n_res))
    res_aa = np.zeros(n_res, int)
    res_nb = np.zeros(n_res, int)
    chain_nb = np.zeros(n_res, int)
    chain_index: Dict[str, int] = {}
    for r in range(n_res):
        i0 = int(starts[r])
        res_aa[r] = int(AA.from_str(cols["resnames"][int(order[i0])]))
        res_nb[r] = int(cols["resseq"][int(order[i0])])
        ch = cols["chains"][int(order[i0])]
        chain_nb[r] = chain_index.setdefault(ch, len(chain_index))
    aatype = res_aa[rid]
    ph = np.zeros((n_res, MAX_NUM_HEAVYATOMS, 3))
    pm = np.zeros((n_res, MAX_NUM_HEAVYATOMS), bool)
    for i in range(len(el)):
        s = _slot_of(int(aatype[i]), names[i])
        if s >= 0:
            ph[rid[i], s] = pos[i]
            pm[rid[i], s] = True
    atoms_out = PocketAtoms(
        element=el,
        element_index=np.asarray([_POCKET_Z_INDEX.get(int(z), 1)
                                  for z in el]),
        pos=np.asarray(pos, float), is_backbone=np.asarray(bb, bool),
        atom_to_aa_type=aatype.astype(int), atom_name=names,
        res_id=rid.astype(int))
    residues_out = PocketResidues(
        aa=res_aa, pos_heavyatom=ph, mask_heavyatom=pm,
        res_nb=res_nb, chain_nb=chain_nb)
    return atoms_out, residues_out


def parse_pdb_pocket(path_or_text: str):
    """Parse a pocket PDB -> (PocketAtoms, PocketResidues).

    Heavy atoms only (hydrogens skipped like the reference featurizer);
    altloc A preferred; unknown residues typed AA.UNK. Uses the native C++
    scanner + vectorized assembly when the toolchain is available."""
    if "\n" in path_or_text:
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()

    try:
        from .. import native
        cols = (native.parse_pdb_atoms(text) if native.available()
                else None)
    except Exception:
        cols = None
    if cols is not None:
        return _assemble_native(cols)

    atoms = _scan_pdb_python(text)

    # group into residues, keep insertion order
    res_order = []
    res_atoms: Dict[tuple, list] = {}
    for a in atoms:
        key = (a[4], a[5], a[6], a[3])
        if key not in res_atoms:
            res_atoms[key] = []
            res_order.append(key)
        res_atoms[key].append(a)

    el, pos, bb, aatype, names, res_ids = [], [], [], [], [], []
    res_aa, res_pos, res_mask, res_nb, chain_nb = [], [], [], [], []
    chain_index: Dict[str, int] = {}
    for r_i, key in enumerate(res_order):
        chain, resseq, icode, resname = key[0], key[1], key[2], key[3]
        aa = AA.from_str(resname)
        heavy_names = RESTYPE_TO_HEAVYATOM_NAMES.get(aa,
                                                     [""] * MAX_NUM_HEAVYATOMS)
        ph = np.zeros((MAX_NUM_HEAVYATOMS, 3))
        pm = np.zeros(MAX_NUM_HEAVYATOMS, bool)
        for (z, p, name, *_rest) in res_atoms[key]:
            el.append(z)
            pos.append(p)
            bb.append(name in BACKBONE_NAMES)
            aatype.append(int(aa))
            names.append(name)
            res_ids.append(r_i)
            if name in heavy_names:
                slot = heavy_names.index(name)
                ph[slot] = p
                pm[slot] = True
        res_aa.append(int(aa))
        res_pos.append(ph)
        res_mask.append(pm)
        try:
            res_nb.append(int(resseq))
        except ValueError:
            res_nb.append(r_i)
        chain_nb.append(chain_index.setdefault(chain, len(chain_index)))

    el = np.asarray(el, int)
    atoms_out = PocketAtoms(
        element=el,
        element_index=np.asarray([_POCKET_Z_INDEX.get(int(z), 1) for z in el]),
        pos=np.asarray(pos, float),
        is_backbone=np.asarray(bb, bool),
        atom_to_aa_type=np.asarray(aatype, int),
        atom_name=names,
        res_id=np.asarray(res_ids, int),
    )
    residues_out = PocketResidues(
        aa=np.asarray(res_aa, int),
        pos_heavyatom=np.asarray(res_pos, float),
        mask_heavyatom=np.asarray(res_mask, bool),
        res_nb=np.asarray(res_nb, int),
        chain_nb=np.asarray(chain_nb, int),
    )
    return atoms_out, residues_out


def pocket_shell(atoms: PocketAtoms, residues: PocketResidues,
                 ligand_pos: np.ndarray, radius: float = 10.0):
    """Select residues with any atom within `radius` Å of the ligand —
    the pocket extraction rule (reference: scripts/extract_pockets.py:23-48,
    protein_parser.py:167-178). Returns filtered (atoms, residues)."""
    lig = np.asarray(ligand_pos)
    sel_res = []
    for r in range(len(residues.aa)):
        ph = residues.pos_heavyatom[r][residues.mask_heavyatom[r]]
        if len(ph) == 0:
            continue
        d = np.linalg.norm(ph[:, None] - lig[None], axis=-1)
        if d.min() <= radius:
            sel_res.append(r)
    sel_res_set = set(sel_res)
    sel_atoms = [i for i, rid in enumerate(atoms.res_id)
                 if int(rid) in sel_res_set]
    a = PocketAtoms(
        element=atoms.element[sel_atoms],
        element_index=atoms.element_index[sel_atoms],
        pos=atoms.pos[sel_atoms],
        is_backbone=atoms.is_backbone[sel_atoms],
        atom_to_aa_type=atoms.atom_to_aa_type[sel_atoms],
        atom_name=[atoms.atom_name[i] for i in sel_atoms],
        res_id=np.asarray([sel_res.index(int(atoms.res_id[i]))
                           for i in sel_atoms]),
    )
    r = PocketResidues(
        aa=residues.aa[sel_res],
        pos_heavyatom=residues.pos_heavyatom[sel_res],
        mask_heavyatom=residues.mask_heavyatom[sel_res],
        res_nb=residues.res_nb[sel_res],
        chain_nb=residues.chain_nb[sel_res],
    )
    return a, r

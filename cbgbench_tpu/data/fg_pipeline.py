"""D3FG data pipeline: real molecules -> FG-frame batches + two-stage pool.

Covers the reference's pl_fg dataset path (repo/datasets/pl.py:291-390:
coarse FG frames for ligand + residue frames for protein) and the denovo
two-stage protocol: stage 1 generates FG frames (sample_d3fg), the context
pool hands assembled atoms to stage-2 TargetDiff linker diffusion
(reference: sample.py:232-241 + init_lig.py:55-122 load_ctx).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..chem.fg_detect import atoms_from_fg, decompose_fg
from ..chem.mol import Molecule
from ..constants.fg import NUM_FG_TYPES
from ..utils.so3 import rotation_to_so3vec, so3vec_to_rotation
from .batch import FGBatch, FGNodes, ResidueNodes


from ..chem.fg_detect import rotation_to_so3vec as _np_rotation_to_so3vec


def build_fg_sample(sample: dict, mode: str = "basic") -> dict:
    """Featurized sample (with 'residues') -> FG-frame arrays (numpy)."""
    from ..constants.molecule import get_atomic_number_from_index

    lig = sample["ligand"]
    z = np.array(get_atomic_number_from_index(
        lig["atype"], "basic" if np.asarray(lig["atype"]).max() < 8
        else "add_aromatic"))
    mol = Molecule(z, lig["pos"])
    bi, bt = lig.get("bond_index"), lig.get("bond_type")
    if bi is not None and np.asarray(bi).size:
        for k in range(bi.shape[1]):
            mol.add_bond(int(bi[0, k]), int(bi[1, k]), int(bt[k]))
    fgs = decompose_fg(mol)
    centers = np.stack([f["center"] for f in fgs]).astype(np.float32)
    Rs = np.stack([f["R"] for f in fgs]).astype(np.float32)
    orients = _np_rotation_to_so3vec(Rs)
    wids = np.array([f["wid"] for f in fgs], np.int32)
    return {"fg_center": centers, "fg_orient": orients, "fg_type": wids,
            "residues": sample["residues"],
            "translation": sample.get("translation", np.zeros(3, np.float32))}


def stack_fg_batch(samples: List[dict], fg_cap: int = 24,
                   res_cap: int = 96) -> FGBatch:
    b = len(samples)
    lig_pos = np.zeros((b, fg_cap, 3), np.float32)
    lig_o = np.zeros((b, fg_cap, 3), np.float32)
    lig_t = np.zeros((b, fg_cap), np.int32)
    lig_mask = np.zeros((b, fg_cap), bool)
    res_pos = np.zeros((b, res_cap, 15, 3), np.float32)
    res_mha = np.zeros((b, res_cap, 15), bool)
    res_aa = np.zeros((b, res_cap), np.int32)
    res_nb = np.zeros((b, res_cap), np.int32)
    chain_nb = np.zeros((b, res_cap), np.int32)
    res_mask = np.zeros((b, res_cap), bool)
    rec_type = np.zeros((b, res_cap), np.int32)
    trans = np.zeros((b, 3), np.float32)
    for i, s in enumerate(samples):
        nf = min(len(s["fg_type"]), fg_cap)
        lig_pos[i, :nf] = s["fg_center"][:nf]
        lig_o[i, :nf] = s["fg_orient"][:nf]
        lig_t[i, :nf] = s["fg_type"][:nf]
        lig_mask[i, :nf] = True
        r = s["residues"]
        nr = min(len(r["aa"]), res_cap)
        res_pos[i, :nr] = r["pos_heavyatom"][:nr]
        res_mha[i, :nr] = r["mask_heavyatom"][:nr]
        res_aa[i, :nr] = r["aa"][:nr]
        res_nb[i, :nr] = r["res_nb"][:nr]
        chain_nb[i, :nr] = r["chain_nb"][:nr]
        res_mask[i, :nr] = True
        rec_type[i, :nr] = NUM_FG_TYPES + r["aa"][:nr]
        trans[i] = s.get("translation", np.zeros(3))
    ligand = FGNodes(pos=jnp.asarray(lig_pos), orient=jnp.asarray(lig_o),
                     type_fg=jnp.asarray(lig_t), mask=jnp.asarray(lig_mask),
                     gen_flag=jnp.asarray(lig_mask))
    residues = ResidueNodes(
        pos_heavyatom=jnp.asarray(res_pos), mask_heavyatom=jnp.asarray(res_mha),
        aa=jnp.asarray(res_aa), res_nb=jnp.asarray(res_nb),
        chain_nb=jnp.asarray(chain_nb), mask=jnp.asarray(res_mask))
    return FGBatch(ligand=ligand, residues=residues,
                   rec_type=jnp.asarray(rec_type),
                   translation=jnp.asarray(trans))


# ---------------------------------------------------------------------------
# two-stage pool protocol (D3FG stage 1 -> TargetDiff stage 2)
# ---------------------------------------------------------------------------

def save_ctx_pool(path: str, out: dict, batch: FGBatch):
    """Assemble atoms from generated FG frames and persist the context pool
    (one entry per batch element)."""
    pool = []
    centers = np.asarray(out["pos"])
    orients = np.asarray(out["orient"])
    wids = np.asarray(out["type_fg"])
    mask = np.asarray(batch.ligand.mask)
    trans = np.asarray(batch.translation)
    for i in range(centers.shape[0]):
        m = mask[i]
        import jax
        Rs = np.asarray(so3vec_to_rotation(jnp.asarray(orients[i][m])))
        z, pos = atoms_from_fg(centers[i][m], Rs, wids[i][m])
        # fg_types: generated motif class ids per FG node (stage-1 quality
        # eval compares their histogram vs fg_detect on reference ligands)
        pool.append({"element": z, "pos": pos + trans[i],
                     "fg_types": wids[i][m].astype(np.int32)})
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(pool, f)
    return pool


def load_ctx_pool(path: str) -> List[dict]:
    with open(path, "rb") as f:
        return pickle.load(f)


def ctx_to_ligand_dict(ctx: dict, mode: str = "basic") -> dict:
    """Pool entry -> fixed-context ligand dict for stage-2 linker diffusion
    (gen_flag False on the FG atoms; linker atoms appended by
    assign_linkernum/keep_ctx_only transforms)."""
    from ..constants.molecule import MAP_ATOM_TYPE_ONLY_TO_INDEX
    atype = np.array([MAP_ATOM_TYPE_ONLY_TO_INDEX.get(int(z), 1)
                      for z in ctx["element"]], np.int32)
    return {"pos": ctx["pos"].astype(np.float32), "atype": atype,
            "gen_flag": np.zeros(len(atype), bool)}

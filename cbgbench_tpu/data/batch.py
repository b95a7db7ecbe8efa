"""Padded, fixed-shape pocket-ligand batches — the TPU-native data model.

The reference batches graphs PyG-style: flat node tensors + a batch-index
vector, with dynamic node counts per batch (reference: repo/utils/loader.py).
That idiom forces scatter/gather CUDA kernels and dynamic shapes — both
hostile to XLA. Here every pocket-ligand complex lives in fixed-size padded
buffers:

    ligand :  [B, NL, ...]   (NL = ligand capacity, default 64)
    protein:  [B, NR, ...]   (NR = receptor capacity, default 448)

with boolean validity masks. "Composing" ligand+receptor context (reference:
repo/modules/common.py:195-221 compose_context) becomes a plain concatenation
along the node axis — no stable sort, no index remapping. All downstream
compute is dense, batched, static-shape, and vmap/pjit-friendly.

Capacities are chosen so the composed node count NL+NR is a multiple of 128
(MXU lane width). The CrossDocked pocket10 shells hold ~300-600 receptor
atoms and ligands ≤ ~60 heavy atoms, so the default 64+448=512 bucket fits
nearly all data; a larger bucket (128+896=1024) covers the tail.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

# Default shape bucket (composed size 512 = 4 * 128).
DEFAULT_LIG_CAP = 64
DEFAULT_REC_CAP = 448


@struct.dataclass
class LigandNodes:
    """Padded ligand atoms. ``atype`` indexes the featurizer-mode class space
    (8/13/23 classes) or the FG class space for coarse-grained models."""

    pos: jnp.ndarray          # [B, NL, 3] float32
    atype: jnp.ndarray        # [B, NL]    int32
    mask: jnp.ndarray         # [B, NL]    bool — valid atom
    gen_flag: jnp.ndarray     # [B, NL]    bool — atom is generated (vs. fixed context)
    # Dense bond adjacency for AR models / losses; 0 = no bond. Kept tiny
    # ([B, 64, 64] int8) so it rides along even when unused.
    bond: Optional[jnp.ndarray] = None    # [B, NL, NL] int8

    @property
    def capacity(self) -> int:
        return self.pos.shape[-2]


@struct.dataclass
class ProteinNodes:
    """Padded receptor pocket atoms (full-atom representation)."""

    pos: jnp.ndarray          # [B, NR, 3] float32
    element: jnp.ndarray      # [B, NR]    int32 — index into POCKET_ATOMIC_NUMBERS
    is_backbone: jnp.ndarray  # [B, NR]    bool
    aa: jnp.ndarray           # [B, NR]    int32 — amino-acid class of parent residue
    mask: jnp.ndarray         # [B, NR]    bool

    @property
    def capacity(self) -> int:
        return self.pos.shape[-2]


@struct.dataclass
class ResidueNodes:
    """Padded residue-level receptor (frames), for FG-coarse models (D3FG).
    pos_heavyatom follows the 15-slot heavy-atom layout of
    constants.protein.RESTYPE_TO_HEAVYATOM_NAMES."""

    pos_heavyatom: jnp.ndarray   # [B, NRES, 15, 3]
    mask_heavyatom: jnp.ndarray  # [B, NRES, 15] bool
    aa: jnp.ndarray              # [B, NRES] int32
    res_nb: jnp.ndarray          # [B, NRES] int32
    chain_nb: jnp.ndarray        # [B, NRES] int32
    mask: jnp.ndarray            # [B, NRES] bool


@struct.dataclass
class PocketLigandBatch:
    """One training/sampling batch: B pockets, each a (ligand, protein) pair.

    ``translation`` records the centering shift applied by transforms
    (reference: repo/datasets/transforms/translation.py) so generated
    coordinates can be mapped back to the original frame at save time.
    """

    ligand: LigandNodes
    protein: ProteinNodes
    translation: jnp.ndarray                 # [B, 3]
    residues: Optional[ResidueNodes] = None

    @property
    def batch_size(self) -> int:
        return self.ligand.pos.shape[0]

    def compose(self):
        """Concatenate ligand+receptor node sets -> composed arrays.

        Returns a dict with pos [B,N,3], lig_flag/gen_flag/mask [B,N]
        (N = NL + NR). Replaces reference compose_context: padded layout
        makes the stable sort / index remap unnecessary.
        """
        lig, rec = self.ligand, self.protein
        pos = jnp.concatenate([lig.pos, rec.pos], axis=1)
        mask = jnp.concatenate([lig.mask, rec.mask], axis=1)
        lig_flag = jnp.concatenate(
            [lig.mask, jnp.zeros_like(rec.mask)], axis=1)
        gen_flag = jnp.concatenate(
            [lig.gen_flag, jnp.zeros_like(rec.mask)], axis=1)
        return {"pos": pos, "mask": mask, "lig_flag": lig_flag,
                "gen_flag": gen_flag}


# ---------------------------------------------------------------------------
# Host-side batch construction (numpy).
# ---------------------------------------------------------------------------

def _pad_to(arr: np.ndarray, n: int, axis: int = 0, fill=0) -> np.ndarray:
    pad = n - arr.shape[axis]
    if pad < 0:
        raise ValueError(
            f"sample with {arr.shape[axis]} nodes exceeds capacity {n}; "
            f"use a larger shape bucket")
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def pad_ligand(pos, atype, gen_flag=None, bond_index=None, bond_type=None,
               cap: int = DEFAULT_LIG_CAP):
    """One ligand dict -> padded numpy arrays (no batch dim)."""
    pos = np.asarray(pos, np.float32)
    atype = np.asarray(atype, np.int32)
    n = pos.shape[0]
    if gen_flag is None:
        gen_flag = np.ones(n, bool)
    mask = np.ones(n, bool)
    bond = np.zeros((cap, cap), np.int8)
    if bond_index is not None and len(np.asarray(bond_index).reshape(2, -1)[0]):
        bi = np.asarray(bond_index).reshape(2, -1)
        bt = (np.asarray(bond_type).reshape(-1) if bond_type is not None
              else np.ones(bi.shape[1]))
        bond[bi[0], bi[1]] = bt
        bond[bi[1], bi[0]] = bt
    return dict(
        pos=_pad_to(pos, cap),
        atype=_pad_to(atype, cap),
        mask=_pad_to(mask, cap),
        gen_flag=_pad_to(np.asarray(gen_flag, bool), cap),
        bond=bond,
    )


def pad_protein(pos, element, is_backbone, aa, cap: int = DEFAULT_REC_CAP,
                **_extra):
    # _extra absorbs featurizer keys the generic batch does not carry
    # (e.g. is_alpha, used only by FLAG's structure-refinement pairs)
    pos = np.asarray(pos, np.float32)
    n = pos.shape[0]
    return dict(
        pos=_pad_to(pos, cap),
        element=_pad_to(np.asarray(element, np.int32), cap),
        is_backbone=_pad_to(np.asarray(is_backbone, bool), cap),
        aa=_pad_to(np.asarray(aa, np.int32), cap),
        mask=_pad_to(np.ones(n, bool), cap),
    )


def stack_batch(samples, lig_cap: int = DEFAULT_LIG_CAP,
                rec_cap: int = DEFAULT_REC_CAP) -> PocketLigandBatch:
    """List of per-sample dicts -> a device-ready PocketLigandBatch.

    Each sample: {'ligand': {pos, atype, [gen_flag, bond_index, bond_type]},
                  'protein': {pos, element, is_backbone, aa},
                  ['translation': (3,)]}
    """
    ligs = [pad_ligand(cap=lig_cap, **s["ligand"]) for s in samples]
    recs = [pad_protein(cap=rec_cap, **s["protein"]) for s in samples]
    trans = np.stack([np.asarray(s.get("translation", np.zeros(3)), np.float32)
                      for s in samples])

    def st(dicts, key):
        return jnp.asarray(np.stack([d[key] for d in dicts]))

    ligand = LigandNodes(
        pos=st(ligs, "pos"), atype=st(ligs, "atype"), mask=st(ligs, "mask"),
        gen_flag=st(ligs, "gen_flag"), bond=st(ligs, "bond"))
    protein = ProteinNodes(
        pos=st(recs, "pos"), element=st(recs, "element"),
        is_backbone=st(recs, "is_backbone"), aa=st(recs, "aa"),
        mask=st(recs, "mask"))
    return PocketLigandBatch(ligand=ligand, protein=protein,
                             translation=jnp.asarray(trans))


def synthetic_batch(rng: np.random.Generator | int = 0, batch_size: int = 4,
                    n_lig: int = 24, n_rec: int = 300, num_atom_types: int = 13,
                    lig_cap: int = DEFAULT_LIG_CAP,
                    rec_cap: int = DEFAULT_REC_CAP) -> PocketLigandBatch:
    """Random plausible pocket batch for tests and benchmarks."""
    if not isinstance(rng, np.random.Generator):
        rng = np.random.default_rng(rng)
    samples = []
    for _ in range(batch_size):
        nl = int(rng.integers(max(4, n_lig // 2), n_lig + 1))
        nr = int(rng.integers(max(16, n_rec // 2), n_rec + 1))
        rec_pos = rng.normal(scale=5.0, size=(nr, 3))
        lig_pos = rng.normal(scale=2.0, size=(nl, 3))
        samples.append({
            "ligand": dict(pos=lig_pos,
                           atype=rng.integers(0, num_atom_types, nl)),
            "protein": dict(pos=rec_pos,
                            element=rng.integers(0, 6, nr),
                            is_backbone=rng.integers(0, 2, nr).astype(bool),
                            aa=rng.integers(0, 20, nr)),
        })
    return stack_batch(samples, lig_cap=lig_cap, rec_cap=rec_cap)


@struct.dataclass
class FGNodes:
    """Padded ligand functional-group frames (D3FG coarse representation)."""

    pos: jnp.ndarray          # [B, NF, 3]  frame centers
    orient: jnp.ndarray       # [B, NF, 3]  SO(3) vectors
    type_fg: jnp.ndarray      # [B, NF]     FG class
    mask: jnp.ndarray         # [B, NF]
    gen_flag: jnp.ndarray     # [B, NF]
    # full atoms per FG (15-slot layout, for assembly/decoding)
    pos_heavyatom: Optional[jnp.ndarray] = None   # [B, NF, 15, 3]
    mask_heavyatom: Optional[jnp.ndarray] = None  # [B, NF, 15]

    @property
    def capacity(self) -> int:
        return self.pos.shape[-2]


@struct.dataclass
class FGBatch:
    """D3FG batch: ligand FG frames + residue-level receptor."""

    ligand: FGNodes
    residues: ResidueNodes
    rec_type: jnp.ndarray     # [B, NR] FG-merged class of each residue
    translation: jnp.ndarray  # [B, 3]

    @property
    def batch_size(self) -> int:
        return self.ligand.pos.shape[0]


def synthetic_fg_batch(rng=0, batch_size: int = 2, n_fg: int = 6,
                       n_res: int = 40, num_fg_types: int = 28,
                       fg_cap: int = 8, res_cap: int = 48) -> FGBatch:
    """Random FG-frame batch for tests/benchmarks."""
    if not isinstance(rng, np.random.Generator):
        rng = np.random.default_rng(rng)
    from ..constants.protein import NUM_AA_TYPES

    b = batch_size
    lig_pos = np.zeros((b, fg_cap, 3), np.float32)
    lig_o = np.zeros((b, fg_cap, 3), np.float32)
    lig_t = np.zeros((b, fg_cap), np.int32)
    lig_mask = np.zeros((b, fg_cap), bool)
    res_pos = np.zeros((b, res_cap, 15, 3), np.float32)
    res_mask_ha = np.zeros((b, res_cap, 15), bool)
    res_aa = np.zeros((b, res_cap), np.int32)
    res_nb = np.zeros((b, res_cap), np.int32)
    chain_nb = np.zeros((b, res_cap), np.int32)
    res_mask = np.zeros((b, res_cap), bool)
    rec_type = np.zeros((b, res_cap), np.int32)
    for i in range(b):
        nf = int(rng.integers(max(2, n_fg // 2), n_fg + 1))
        nr = int(rng.integers(max(8, n_res // 2), n_res + 1))
        lig_pos[i, :nf] = rng.normal(scale=2.0, size=(nf, 3))
        lig_o[i, :nf] = rng.normal(scale=0.5, size=(nf, 3))
        lig_t[i, :nf] = rng.integers(0, num_fg_types, nf)
        lig_mask[i, :nf] = True
        res_pos[i, :nr] = rng.normal(scale=6.0, size=(nr, 1, 3)) + \
            rng.normal(scale=1.0, size=(nr, 15, 3))
        res_mask_ha[i, :nr, :4] = True
        res_aa[i, :nr] = rng.integers(0, 20, nr)
        res_nb[i, :nr] = np.arange(nr)
        res_mask[i, :nr] = True
        rec_type[i, :nr] = num_fg_types + res_aa[i, :nr]
    ligand = FGNodes(pos=jnp.asarray(lig_pos), orient=jnp.asarray(lig_o),
                     type_fg=jnp.asarray(lig_t), mask=jnp.asarray(lig_mask),
                     gen_flag=jnp.asarray(lig_mask))
    residues = ResidueNodes(
        pos_heavyatom=jnp.asarray(res_pos),
        mask_heavyatom=jnp.asarray(res_mask_ha), aa=jnp.asarray(res_aa),
        res_nb=jnp.asarray(res_nb), chain_nb=jnp.asarray(chain_nb),
        mask=jnp.asarray(res_mask))
    return FGBatch(ligand=ligand, residues=residues,
                   rec_type=jnp.asarray(rec_type),
                   translation=jnp.zeros((b, 3)))

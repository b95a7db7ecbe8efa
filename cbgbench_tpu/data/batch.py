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


def pad_protein(pos, element, is_backbone, aa, cap: int = DEFAULT_REC_CAP):
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

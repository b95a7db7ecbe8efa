"""Host-side declarative transform pipeline (numpy).

Mirrors the reference's TRANSFORM_DICT registry + Compose
(reference: repo/datasets/transforms/__init__.py:16-40). Samples are plain
nested dicts: {'ligand': {...}, 'protein': {...}, 'translation': (3,)},
consumed by data.batch.stack_batch.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List

import numpy as np

from ..constants.molecule import NUM_ATOM_TYPES_BY_MODE
from ..utils.registry import TRANSFORMS

_PRIOR_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                          "priors")
_prior_cache: Dict[str, dict] = {}


def _load_prior(name: str) -> dict:
    if name not in _prior_cache:
        _prior_cache[name] = np.load(
            os.path.join(_PRIOR_DIR, name), allow_pickle=True).item()
    return _prior_cache[name]


def get_space_size(pos: np.ndarray) -> float:
    """Pocket spatial extent: median of the 10 largest pairwise distances
    (reference: init_lig.py:255-258)."""
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    iu = np.triu_indices(len(pos), 1)
    vals = np.sort(d[iu])[::-1][:10]
    return float(np.median(vals))


def sample_count_from_prior(space_size: float, prior: dict,
                            rng: np.random.Generator) -> int:
    bounds = prior["bounds"]
    bin_idx = len(bounds)
    for i, b in enumerate(bounds):
        if b > space_size:
            bin_idx = i
            break
    # overflow: the reference's _atom_num prior carries len(bounds)+1 bins
    # (last = everything) but its _linker/_fg priors carry exactly
    # len(bounds) — clamp so oversized pockets use the widest bin instead
    # of raising IndexError
    bin_idx = min(bin_idx, len(prior["bins"]) - 1)
    nums, probs = prior["bins"][bin_idx]
    return int(rng.choice(nums, p=np.asarray(probs) / np.sum(probs)))


def compose(transform_cfgs: List[dict]) -> Callable:
    fns = []
    for cfg in transform_cfgs:
        cfg = dict(cfg)
        kind = cfg.pop("type")
        fns.append(TRANSFORMS.get(kind)(**cfg))

    def apply(sample: dict, rng: np.random.Generator) -> dict:
        for fn in fns:
            sample = fn(sample, rng)
        return sample

    return apply


# ---------------------------------------------------------------------------
# transforms (each factory returns fn(sample, rng) -> sample)
# ---------------------------------------------------------------------------

@TRANSFORMS.register("center_pos")
def center_pos(center_flag: str = "protein", **_):
    """Shift everything by the chosen graph's centroid; record translation
    (reference: translation.py:5-27)."""
    def fn(s, rng):
        center = s[center_flag]["pos"].mean(axis=0)
        s["protein"]["pos"] = s["protein"]["pos"] - center
        if "ligand" in s and "pos" in s["ligand"]:
            s["ligand"]["pos"] = s["ligand"]["pos"] - center
        s["translation"] = center.astype(np.float32)
        return s
    return fn


@TRANSFORMS.register("center_whole_pos")
def center_whole_pos(**_):
    def fn(s, rng):
        p = s["protein"]["pos"]
        if "ligand" in s and len(s["ligand"].get("pos", [])):
            l = s["ligand"]["pos"]
            center = (p.sum(0) + l.sum(0)) / (len(p) + len(l))
        else:
            center = p.mean(0)
        s["protein"]["pos"] = p - center
        if "ligand" in s and "pos" in s["ligand"]:
            s["ligand"]["pos"] = s["ligand"]["pos"] - center
        s["translation"] = center.astype(np.float32)
        return s
    return fn


@TRANSFORMS.register("add_pos_noise")
def add_pos_noise(noise_std: float = 0.1, graph_name: str = "protein", **_):
    def fn(s, rng):
        g = s[graph_name]
        g["pos"] = g["pos"] + rng.normal(scale=noise_std,
                                         size=g["pos"].shape).astype(np.float32)
        return s
    return fn


@TRANSFORMS.register("remove_ligand")
def remove_ligand(**_):
    def fn(s, rng):
        s["ligand"] = {"pos": np.zeros((0, 3), np.float32),
                       "atype": np.zeros((0,), np.int32)}
        return s
    return fn


@TRANSFORMS.register("assign_molsize")
def assign_molsize(distribution: str = "prior_distcond", **_):
    """Draw the generated-atom count from the pocket-size-conditioned
    empirical prior (reference: init_lig.py:232-258)."""
    prior = _load_prior("_atom_num_dist.npy")

    def fn(s, rng):
        size = get_space_size(s["protein"]["pos"])
        n = sample_count_from_prior(size, prior, rng)
        s["ligand"] = {"pos": np.zeros((n, 3), np.float32),
                       "atype": np.zeros((n,), np.int32),
                       "gen_flag": np.ones(n, bool)}
        return s
    return fn


@TRANSFORMS.register("assign_linkernum")
def assign_linkernum(distribution: str = "prior_distcond", **_):
    prior_atom = _load_prior("_atom_num_dist.npy")
    prior_linker = _load_prior("_linker_num_dist.npy")

    def fn(s, rng):
        size = get_space_size(s["protein"]["pos"])
        n_ctx = len(s.get("ligand_ctx", {}).get("atype", []))
        n = sample_count_from_prior(size, prior_atom, rng) - n_ctx
        if n <= 0:
            n = sample_count_from_prior(size, prior_linker, rng)
        s["ligand"] = {"pos": np.zeros((n, 3), np.float32),
                       "atype": np.zeros((n,), np.int32),
                       "gen_flag": np.ones(n, bool)}
        return s
    return fn


@TRANSFORMS.register("assign_fgnum")
def assign_fgnum(distribution: str = "prior_distcond", **_):
    prior = _load_prior("_fg_num_dist.npy")

    def fn(s, rng):
        ca = s["protein"]["pos_heavyatom"][:, 1]
        size = get_space_size(ca)
        n = sample_count_from_prior(size, prior, rng)
        s["ligand"] = {"type_fg": np.zeros((n,), np.int32),
                       "gen_flag": np.ones(n, bool)}
        return s
    return fn


@TRANSFORMS.register("assign_atomtype")
def assign_atomtype(distribution: str = "uniform",
                    mode: str = "add_aromatic", **_):
    num_types = NUM_ATOM_TYPES_BY_MODE[mode]

    def fn(s, rng):
        n = len(s["ligand"]["atype"])
        if distribution == "uniform":
            s["ligand"]["atype"] = rng.integers(0, num_types, n).astype(np.int32)
        elif distribution == "absorbing":
            s["ligand"]["atype"] = np.zeros(n, np.int32)
        else:
            raise ValueError(distribution)
        return s
    return fn


@TRANSFORMS.register("assign_molpos")
def assign_molpos(distribution: str = "gaussian", **_):
    """N(0, I) in the centered pocket frame (reference: init_lig.py:415-432;
    center_pos must run first so 0 is the pocket centroid)."""
    def fn(s, rng):
        n = len(s["ligand"]["atype"])
        pos = rng.standard_normal((n, 3)).astype(np.float32)
        if distribution == "zero_mean_gaussian":
            pos -= pos.mean(0, keepdims=True)
        s["ligand"]["pos"] = pos
        return s
    return fn


def _mol_from_ligand_dict(lig: dict):
    from ..chem.mol import Molecule
    from ..constants.molecule import get_atomic_number_from_index
    atype = np.asarray(lig["atype"])
    mode_guess = "basic" if atype.max() < 8 else "add_aromatic"
    z = np.array(get_atomic_number_from_index(atype, mode_guess))
    mol = Molecule(z, lig["pos"])
    bi, bt = lig.get("bond_index"), lig.get("bond_type")
    if bi is not None and np.asarray(bi).size:
        bi = np.asarray(bi)
        for k in range(bi.shape[1]):
            mol.add_bond(int(bi[0, k]), int(bi[1, k]), int(bt[k]))
    return mol


def _apply_gen_ctx(s: dict, gen: np.ndarray, ctx: np.ndarray) -> dict:
    n = len(s["ligand"]["atype"])
    gen_flag = np.zeros(n, bool)
    gen_flag[gen] = True
    s["ligand"]["gen_flag"] = gen_flag
    s["ligand"]["ctx_flag"] = ~gen_flag
    return s


def _decomp_rng(s, rng, deterministic: bool):
    """Test-time decomposition must pick the SAME cut for every replica of
    a pocket (the reference precomputes decomp datasets, so all 100
    samples share one kept fragment; stochastic per-replica cuts are a
    train-time augmentation only). Deterministic mode derives the rng from
    the complex name."""
    if not deterministic:
        return rng
    import zlib
    return np.random.default_rng(zlib.crc32(str(s.get("name", "")).encode()))


@TRANSFORMS.register("select_linker")
def select_linker(deterministic: bool = False, **kw):
    """Linker design: generate the middle linker between two kept fragments
    (reference: molecule_parser.py linker_decomp + select.py)."""
    from ..chem.decomp import linker_decomp

    def fn(s, rng):
        rng = _decomp_rng(s, rng, deterministic)
        mol = _mol_from_ligand_dict(s["ligand"])
        out = linker_decomp(mol, rng)
        if out is None:            # fall back to BFS mask-style split
            from .mask import bfs_mask
            masked, context = bfs_mask(mol.num_atoms, None, rng,
                                       min_ratio=0.2, max_ratio=0.5)
            out = (masked, context)
        return _apply_gen_ctx(s, *out)
    return fn


@TRANSFORMS.register("select_frag")
def select_frag(deterministic: bool = False, **kw):
    """Fragment growing: keep one fragment, generate the rest."""
    from ..chem.decomp import fragment_decomp

    def fn(s, rng):
        rng = _decomp_rng(s, rng, deterministic)
        mol = _mol_from_ligand_dict(s["ligand"])
        out = fragment_decomp(mol, rng)
        if out is None:
            from .mask import bfs_mask
            masked, context = bfs_mask(mol.num_atoms, None, rng,
                                       min_ratio=0.3, max_ratio=0.7)
            out = (masked, context)
        return _apply_gen_ctx(s, *out)
    return fn


@TRANSFORMS.register("select_scaffold")
def select_scaffold(**kw):
    """Scaffold hopping: generate the Murcko scaffold, keep side chains."""
    from ..chem.decomp import scaffold_decomp

    def fn(s, rng):
        mol = _mol_from_ligand_dict(s["ligand"])
        out = scaffold_decomp(mol)
        if out is None:
            n = mol.num_atoms
            out = (np.arange(n), np.zeros(0, int))
        return _apply_gen_ctx(s, *out)
    return fn


@TRANSFORMS.register("select_sidechain")
def select_sidechain(**kw):
    """Side-chain decoration: generate side chains, keep the scaffold."""
    from ..chem.decomp import sidechain_decomp

    def fn(s, rng):
        mol = _mol_from_ligand_dict(s["ligand"])
        out = sidechain_decomp(mol)
        if out is None:
            n = mol.num_atoms
            out = (np.arange(n), np.zeros(0, int))
        return _apply_gen_ctx(s, *out)
    return fn


@TRANSFORMS.register("random_mask")
def random_mask_tf(min_ratio=0.0, max_ratio=1.2, min_num_masked=1,
                   min_num_unmasked=0, **kw):
    from .mask import random_mask as _rm

    def fn(s, rng):
        lig = s["ligand"]
        n = len(lig["atype"])
        masked, context = _rm(n, lig.get("bond_index"), rng, min_ratio,
                              max_ratio, min_num_masked, min_num_unmasked,
                              lig.get("ctx_flag"))
        return _apply_gen_ctx(s, masked, context)
    return fn


@TRANSFORMS.register("bfs_mask")
def bfs_mask_tf(min_ratio=0.0, max_ratio=1.2, min_num_masked=1,
                min_num_unmasked=0, inverse=False, **kw):
    from .mask import bfs_mask as _bm

    def fn(s, rng):
        lig = s["ligand"]
        n = len(lig["atype"])
        masked, context = _bm(n, lig.get("bond_index"), rng, min_ratio,
                              max_ratio, min_num_masked, min_num_unmasked,
                              inverse, lig.get("ctx_flag"))
        return _apply_gen_ctx(s, masked, context)
    return fn


@TRANSFORMS.register("mixed_mask")
def mixed_mask_tf(min_ratio=0.0, max_ratio=1.2, min_num_masked=1,
                  min_num_unmasked=0, p_random=0.5, p_bfs=0.25,
                  p_invbfs=0.25, **kw):
    from .mask import mixed_mask as _mm

    def fn(s, rng):
        lig = s["ligand"]
        n = len(lig["atype"])
        masked, context = _mm(n, lig.get("bond_index"), rng, min_ratio,
                              max_ratio, min_num_masked, min_num_unmasked,
                              p_random, p_bfs, p_invbfs, lig.get("ctx_flag"))
        return _apply_gen_ctx(s, masked, context)
    return fn


@TRANSFORMS.register("keep_ctx_only")
def keep_ctx_only(mode: str = "add_aromatic", types_init: str = "uniform",
                  **kw):
    """Decomp test-time: keep the context atoms fixed, replace the generated
    part with prior-initialized atoms (count from the linker prior, uniform
    or absorbing types, Gaussian positions around the kept fragment's
    centroid) — the choose_ctx_gen + assign_linkernum flow
    (reference: configs/*/test + init_lig.py:173-198). ``types_init``
    matches the model's type prior: 'uniform' (targetdiff/diffsbdd) or
    'absorbing' (diffbp's mask-type schedule)."""
    prior_atom = _load_prior("_atom_num_dist.npy")
    prior_linker = _load_prior("_linker_num_dist.npy")
    num_types = NUM_ATOM_TYPES_BY_MODE[mode]

    def fn(s, rng):
        lig = s["ligand"]
        gen_flag = lig.get("gen_flag")
        if gen_flag is None:
            gen_flag = np.ones(len(lig["atype"]), bool)
        ctx = ~gen_flag
        ctx_pos = lig["pos"][ctx]
        ctx_atype = lig["atype"][ctx]
        size = get_space_size(s["protein"]["pos"])
        n = sample_count_from_prior(size, prior_atom, rng) - int(ctx.sum())
        if n <= 0:
            n = sample_count_from_prior(size, prior_linker, rng)
        center = (ctx_pos.mean(0) if len(ctx_pos)
                  else s["protein"]["pos"].mean(0))
        new_pos = center + rng.standard_normal((n, 3)).astype(np.float32)
        if types_init == "absorbing":
            new_types = np.zeros(n, np.int32)
        else:
            new_types = rng.integers(0, num_types, n).astype(np.int32)
        s["ligand"] = {
            "pos": np.concatenate([ctx_pos, new_pos]).astype(np.float32),
            "atype": np.concatenate([ctx_atype, new_types]).astype(np.int32),
            "gen_flag": np.concatenate(
                [np.zeros(len(ctx_pos), bool), np.ones(n, bool)]),
        }
        return s
    return fn


@TRANSFORMS.register("featurize_protein_fa")
@TRANSFORMS.register("featurize_ligand_fa")
@TRANSFORMS.register("featurize_ligand_ar")
def _featurize_noop(**kw):
    """Featurization happens at parse time in RawPairDataset; these names
    are accepted for reference-config compatibility."""
    def fn(s, rng):
        return s
    return fn

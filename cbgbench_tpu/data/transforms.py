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

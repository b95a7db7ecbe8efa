"""D3FG two-stage denovo sampling (reference: SURVEY §3.4).

Stage 1: prior-initialized FG frames -> sample_d3fg -> assembled atoms
persisted to a context pool (gen_ctx_pool_<i>.pkl — the reference's
file-based IPC, sample.py:239-241).
Stage 2: TargetDiff linker diffusion around the fixed FG atoms, consuming
pool entries via the load_ctx transform (init_lig.py:55-122).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.fg_pipeline import save_ctx_pool, stack_fg_batch
from ..data.transforms import (TRANSFORMS, _load_prior, get_space_size,
                               sample_count_from_prior)


def prior_fg_sample(protein_residues: dict, rng: np.random.Generator,
                    num_fg_types: int) -> dict:
    """Prior-initialized FG frames for one pocket (assign_fgnum +
    assign_fgtype uniform + assign_fgpos gaussian + assign_fgori uniform)."""
    ca = protein_residues["pos_heavyatom"][:, 1]
    size = get_space_size(ca)
    n = sample_count_from_prior(size, _load_prior("_fg_num_dist.npy"), rng)
    center = ca.mean(0)
    # uniform SO(3) via random quaternions
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True) + 1e-12
    from ..utils.geometry import quaternion_to_rotation_matrix
    from ..utils.so3 import rotation_to_so3vec
    R = np.asarray(quaternion_to_rotation_matrix(jnp.asarray(q)))
    o = np.asarray(rotation_to_so3vec(jnp.asarray(R)))
    return {
        "fg_center": (center + rng.standard_normal((n, 3)) * 2.0
                      ).astype(np.float32),
        "fg_orient": o.astype(np.float32),
        "fg_type": rng.integers(0, num_fg_types, n).astype(np.int32),
        "residues": protein_residues,
        "translation": np.zeros(3, np.float32),
    }


def corpus_type_bias(alpha: float, raw_path: str = "assets/examples",
                     marginal_json: Optional[str] = None) -> np.ndarray:
    """Importance-correction logit tilt for the stage-1 FG-type head:
    alpha * (log p_corpus - log p_model), eps-mixture smoothed.

    p_corpus: decompose_fg over the dataset's reference ligands (the same
    detector that builds the training supervision — symmetric with
    scripts/eval_d3fg_stage1.py). p_model: the measured generation
    histogram of a T=1 reference run (stage1_metrics.json gen_hist);
    classes the model never draws (e.g. NC=O) get the largest positive
    tilt. alpha=0 disables; alpha=1 is the full correction."""
    import json as _json

    from ..chem.fg_detect import decompose_fg
    from ..chem.mol2 import read_mol2
    from ..chem.sdf import read_sdf
    from ..constants.fg import FG2CLASS, NUM_FG_TYPES
    from ..data.dataset import scan_pair_dir

    ref = np.zeros(NUM_FG_TYPES)
    for _, lig_path in scan_pair_dir(raw_path):
        mols = (read_mol2(lig_path) if lig_path.endswith(".mol2")
                else read_sdf(lig_path))
        for mol in mols[:1]:
            for rec in decompose_fg(mol):
                ref[rec["wid"]] += 1.0
    gen = np.zeros(NUM_FG_TYPES)
    if marginal_json and os.path.exists(marginal_json):
        with open(marginal_json) as f:
            hist = _json.load(f).get("gen_hist", {})
        for key, cnt in hist.items():
            cls = FG2CLASS.get(key)
            if cls is not None:
                gen[cls] += float(cnt)
    # eps-mixture smoothing (NOT Laplace: adding one pseudocount to
    # corpora of different sizes manufactures a +log(N_gen/N_ref) tilt
    # for every class unseen in both — here unseen-in-both cancels to 0)
    eps = 0.01
    p_ref = (1 - eps) * ref / max(ref.sum(), 1.0) + eps / NUM_FG_TYPES
    p_gen = (1 - eps) * gen / max(gen.sum(), 1.0) + eps / NUM_FG_TYPES
    bias = alpha * (np.log(p_ref) - np.log(p_gen))
    return bias.astype(np.float32)


def run_stage1(model, params, dataset, index: int, num_samples: int,
               batch_size: int, out_dir: str, rng_seed: int = 2022,
               fg_cap: int = 24, res_cap: int = 96,
               num_steps=None, type_temp: float = 1.0,
               type_bias=None) -> str:
    """Generate FG sets for one pocket and write the context pool."""
    from ..models.d3fg import sample_d3fg

    nrng = np.random.default_rng(rng_seed + index)
    base = dataset.get(index, nrng)
    pool_path = os.path.join(out_dir, f"gen_ctx_pool_{index}.pkl")
    all_pool = []
    done = 0
    while done < num_samples:
        bs = min(batch_size, num_samples - done)
        samples = [prior_fg_sample(base["residues"], nrng,
                                   model.num_fg_types) for _ in range(bs)]
        batch = stack_fg_batch(samples, fg_cap=fg_cap, res_cap=res_cap)
        out = sample_d3fg(model, params, batch,
                          jax.random.PRNGKey(rng_seed + done),
                          num_steps=num_steps, type_temp=type_temp,
                          type_bias=type_bias)
        all_pool += save_ctx_pool(pool_path + ".tmp", out, batch)
        done += bs
    import pickle
    with open(pool_path, "wb") as f:
        pickle.dump(all_pool, f)
    os.remove(pool_path + ".tmp")
    return pool_path


@TRANSFORMS.register("load_ctx")
def load_ctx(ctx_path: str = "", mode: str = "basic", **kw):
    """Stage-2 transform: pop one generated-FG context from the pool and
    install it as the fixed ligand context (reference: init_lig.py:55-122)."""
    from ..data.fg_pipeline import ctx_to_ligand_dict, load_ctx_pool

    state = {"pool": None, "i": 0}

    def fn(s, rng):
        if state["pool"] is None:
            state["pool"] = load_ctx_pool(ctx_path)
        entry = state["pool"][state["i"] % len(state["pool"])]
        state["i"] += 1
        s["ligand_ctx"] = ctx_to_ligand_dict(entry, mode)
        return s
    return fn


@TRANSFORMS.register("merge_ctx_gen")
def merge_ctx_gen(**kw):
    """Concatenate the fixed FG context with the prior-initialized linker
    atoms (reference: merge.py:27-42)."""
    def fn(s, rng):
        ctx = s.get("ligand_ctx")
        if ctx is None:
            return s
        lig = s["ligand"]
        s["ligand"] = {
            "pos": np.concatenate([ctx["pos"], lig["pos"]]).astype(np.float32),
            "atype": np.concatenate([ctx["atype"], lig["atype"]]).astype(np.int32),
            "gen_flag": np.concatenate([np.zeros(len(ctx["atype"]), bool),
                                        np.ones(len(lig["atype"]), bool)]),
        }
        return s
    return fn

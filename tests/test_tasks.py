"""5-task decomposition tests on real fixture ligands."""

import glob
import os

import numpy as np
import pytest

from cbgbench_tpu.chem import read_sdf
from cbgbench_tpu.chem.decomp import (fragment_decomp, linker_decomp,
                                      murcko_scaffold, scaffold_decomp,
                                      sidechain_decomp)
from cbgbench_tpu.data.transforms import compose

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "examples")
LIGANDS = sorted(glob.glob(os.path.join(ASSETS, "*", "*_ligand.sdf")))
MOLS = [read_sdf(p)[0] for p in LIGANDS]


def _check_partition(mol, gen, ctx):
    assert len(set(gen) & set(ctx)) == 0
    assert sorted(set(gen) | set(ctx)) == list(range(mol.num_atoms))
    assert len(gen) > 0


def test_murcko_scaffold_contains_rings():
    for mol in MOLS:
        scaf = murcko_scaffold(mol)
        ring_atoms = set(a for r in mol.rings() for a in r)
        if ring_atoms:
            assert ring_atoms <= set(scaf.tolist())


def test_linker_decomp():
    rng = np.random.default_rng(0)
    found = 0
    for mol in MOLS:
        out = linker_decomp(mol, rng)
        if out is None:
            continue
        found += 1
        gen, ctx = out
        _check_partition(mol, gen, ctx)
        # linker is connected and flanked by two ctx fragments
        sub = mol.extract(list(gen))
        assert len(sub.fragments()) == 1
    assert found >= 2


def test_fragment_decomp():
    rng = np.random.default_rng(1)
    for mol in MOLS:
        out = fragment_decomp(mol, rng)
        if out is None:
            continue
        gen, ctx = out
        _check_partition(mol, gen, ctx)


def test_scaffold_sidechain_duality():
    for mol in MOLS:
        sc = scaffold_decomp(mol)
        if sc is None:
            continue
        gen_s, ctx_s = sc
        gen_side, ctx_side = sidechain_decomp(mol)
        np.testing.assert_array_equal(gen_s, ctx_side)
        np.testing.assert_array_equal(ctx_s, gen_side)


@pytest.mark.parametrize("task", ["select_linker", "select_frag",
                                  "select_scaffold", "select_sidechain"])
def test_task_transforms(task):
    from cbgbench_tpu.data.dataset import RawPairDataset, example_pairs
    ds = RawPairDataset(example_pairs()[:1], mode="add_aromatic",
                        pocket_radius=10.0)
    tf = compose([{"type": task}])
    rng = np.random.default_rng(0)
    s = ds.get(0, rng)
    s = tf(s, rng)
    gen = s["ligand"]["gen_flag"]
    assert gen.any()
    assert gen.dtype == bool
    assert len(gen) == len(s["ligand"]["atype"])


def test_test_time_decomp_is_deterministic_per_complex():
    """deterministic: true pins one cut per complex across replicas (the
    reference's precomputed decomp datasets share one fragment across all
    samples of a pocket)."""
    import numpy as np
    from cbgbench_tpu.data.dataset import RawPairDataset, example_pairs
    from cbgbench_tpu.data.transforms import compose
    ds = RawPairDataset(example_pairs(), mode="add_aromatic",
                        pocket_radius=10.0)
    for kind in ("select_frag", "select_linker"):
        tf = compose([{"type": kind, "deterministic": True}])
        flags = []
        for seed in (0, 1, 2):
            rng = np.random.default_rng(seed)
            s = tf(ds.get(0, rng), rng)
            flags.append(np.asarray(s["ligand"]["gen_flag"], bool))
        assert (flags[0] == flags[1]).all() and (flags[1] == flags[2]).all()
        # stochastic mode must actually vary (else the flag is meaningless)
        tf2 = compose([{"type": kind}])
        v = [np.asarray(tf2(ds.get(0, np.random.default_rng(s)),
                            np.random.default_rng(s))["ligand"]["gen_flag"],
                        bool) for s in range(6)]
        assert any((v[0] != x).any() for x in v[1:])


def test_stack_batch_tolerates_extra_protein_keys():
    """featurize_protein grew an is_alpha key (FLAG sr pairs); the generic
    stack path must absorb unknown featurizer keys instead of crashing
    (regression: the q2 linker finetune died on pad_protein(is_alpha=...))."""
    import numpy as np

    from cbgbench_tpu.data.batch import stack_batch
    from cbgbench_tpu.data.dataset import RawPairDataset, example_pairs
    ds = RawPairDataset(example_pairs()[:1], mode="add_aromatic",
                        pocket_radius=10.0)
    s = ds.get(0, np.random.default_rng(0))
    assert "is_alpha" in s["protein"]
    s["protein"]["future_key"] = np.zeros(len(s["protein"]["pos"]))
    b = stack_batch([s], lig_cap=96, rec_cap=928)
    assert b.protein.pos.shape == (1, 928, 3)

"""Auxiliary parity: AUROC metric, PDB writer roundtrip, dihedral utils."""

import numpy as np
import jax.numpy as jnp

from cbgbench_tpu.train.evaluate import build_metrics
from cbgbench_tpu.chem.pdb import parse_pdb_pocket
from cbgbench_tpu.chem.pdb_writer import write_pocket_pdb
from cbgbench_tpu.data.dataset import example_pairs
from cbgbench_tpu.utils.geometry import batch_dihedrals, von_mises_loss


def test_auroc_discriminates():
    fns = build_metrics([{"name": "auroc"}, {"name": "accuracy"}])
    rng = np.random.default_rng(0)
    y = rng.integers(0, 3, 200)
    good = {"v0": y, "c_pred": np.eye(3)[y] * 2 + rng.normal(size=(200, 3)),
            "mask_gen": np.ones(200, bool)}
    rand = {"v0": y, "c_pred": rng.normal(size=(200, 3)),
            "mask_gen": np.ones(200, bool)}
    assert fns["auroc"](good) > 0.85
    assert 0.3 < fns["auroc"](rand) < 0.7
    assert fns["accuracy"](good) > fns["accuracy"](rand)


def test_pdb_writer_roundtrip(tmp_path):
    atoms, res = parse_pdb_pocket(example_pairs()[0][0])
    out = str(tmp_path / "pocket.pdb")
    write_pocket_pdb(out, res)
    _, r2 = parse_pdb_pocket(out)
    assert len(r2.aa) == len(res.aa)
    np.testing.assert_array_equal(np.asarray(r2.aa), np.asarray(res.aa))
    ca = res.mask_heavyatom[:, 1] & r2.mask_heavyatom[:, 1]
    np.testing.assert_allclose(r2.pos_heavyatom[ca, 1],
                               res.pos_heavyatom[ca, 1], atol=1e-3)


def test_von_mises_and_dihedrals():
    assert float(von_mises_loss(jnp.pi / 2, jnp.pi / 2)) < 1e-6
    assert float(von_mises_loss(0.0, jnp.pi)) > 1.9
    p = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)))
    d = batch_dihedrals(p[0], p[1], p[2], p[3])
    assert -np.pi <= float(d) <= np.pi


def test_load_torch_pickle_formats(tmp_path):
    """Torch-free reader must handle both torch.save zip + legacy formats."""
    import pytest
    torch = pytest.importorskip("torch")
    from cbgbench_tpu.data.dataset import load_torch_pickle
    d = {"train": [("a_pocket10.pdb", "a.sdf"), ("c_pocket10.pdb", "c.sdf")],
         "test": [("b_pocket10.pdb", "b.sdf")]}
    p = str(tmp_path / "split_by_name.pt")
    torch.save(d, p)
    assert load_torch_pickle(p) == d
    p2 = str(tmp_path / "legacy.pt")
    torch.save(d, p2, _use_new_zipfile_serialization=False)
    assert load_torch_pickle(p2) == d
    # json sibling format
    import json
    p3 = str(tmp_path / "split.json")
    with open(p3, "w") as f:
        json.dump({"train": [["a", "b"]]}, f)
    assert load_torch_pickle(p3) == {"train": [["a", "b"]]}


def test_crossdocked_lmdb_synthetic(tmp_path):
    """Synthetic LMDB cache roundtrip (gated on the lmdb package)."""
    import pytest
    lmdb = pytest.importorskip("lmdb")
    import pickle
    import numpy as np
    from cbgbench_tpu.data.dataset import CrossDockedLMDB
    path = str(tmp_path / "cache.lmdb")
    env = lmdb.open(path, map_size=10 << 20, subdir=False)
    sample = {"protein": {"pos": np.zeros((4, 3), np.float32),
                          "element": np.array([6, 6, 7, 8]),
                          "is_backbone": np.zeros(4, bool),
                          "atom_to_aa_type": np.zeros(4, np.int64)},
              "ligand": {"pos": np.zeros((3, 3), np.float32),
                         "atom_type": np.array([6, 7, 8]),
                         "bond_index": np.zeros((2, 0), int),
                         "bond_type": np.zeros(0, int)}}
    with env.begin(write=True) as txn:
        txn.put(b"k0", pickle.dumps(sample))
    env.close()
    ds = CrossDockedLMDB(path)
    assert len(ds) == 1
    out = ds.get(0, np.random.default_rng(0))
    assert out["ligand"]["pos"].shape == (3, 3)

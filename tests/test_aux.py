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

"""Per-motif FG frame-function tests (reference: frame_fg.py:95-565).

For every motif in the vocabulary: extracting the frame from a rigidly
transformed copy of the canonical conformer must recover frame-local
coordinates equal to the canonical template (RMSD ~ 0), and assembling
atoms back from (center, R, type) must reproduce the world coordinates.
Chirality-split motifs must classify to the correct _1/_2 class.
"""

import glob
import os

import numpy as np
import pytest

from cbgbench_tpu.chem.fg_detect import (FRAME_ANCHORS, assign_chirality,
                                         decompose_fg, reindex,
                                         rotation_to_so3vec,
                                         transform_into_fg_data)
from cbgbench_tpu.constants.fg import (CLASS2FG, FG2CLASS, MOTIF_ELEMENTS,
                                       MOTIF_POS)

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "examples")


def _rand_rt(seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.standard_normal(3) * 5.0
    return Q, t


_TEMPLATED = [k for k in FRAME_ANCHORS
              if (k in MOTIF_POS and len(MOTIF_POS[k]))
              or (f"{k}_1" in MOTIF_POS and len(MOTIF_POS[f"{k}_1"]))]


@pytest.mark.parametrize("key", _TEMPLATED)
def test_frame_roundtrip_per_motif(key):
    tpl_key = key if key in MOTIF_POS and len(MOTIF_POS[key]) else f"{key}_1"
    tpl = np.asarray(MOTIF_POS[tpl_key], float)
    Q, t = _rand_rt(hash(key) % 2 ** 31)
    world = tpl @ Q.T + t

    out = transform_into_fg_data(key, world)
    # frame-local coordinates must reproduce the canonical template
    rmsd = np.sqrt(((out["local_pos"] - tpl) ** 2).sum(-1).mean())
    assert rmsd < 1e-4, (key, rmsd)
    # so3 vec is finite and consistent with R
    assert np.isfinite(out["v"]).all()
    # anchor reindexing is a permutation with anchors first
    _, idx_re = reindex(FRAME_ANCHORS[key], len(tpl))
    assert sorted(idx_re) == list(range(len(tpl)))
    assert idx_re[:3] == FRAME_ANCHORS[key]

    # assemble atoms back from the generated-frame representation
    from cbgbench_tpu.chem.fg_detect import atoms_from_fg
    wid = FG2CLASS.get(out["key"], FG2CLASS.get(key))
    zs, ps = atoms_from_fg(np.array([out["center"]]),
                           np.array([out["R"]]), np.array([wid]))
    back_key = CLASS2FG[wid]
    n_real = sum(1 for e in MOTIF_ELEMENTS[back_key] if e != "*")
    assert len(zs) == n_real
    # reconstructed atoms must lie on the original world coordinates
    d = np.linalg.norm(ps[:, None] - world[None], axis=-1)
    assert d.min(axis=1).max() < 1e-3, (key, d.min(axis=1).max())


@pytest.mark.parametrize("key", ["NS(=O)=O", "O=CNO"])
@pytest.mark.parametrize("variant", ["1", "2"])
def test_chirality_split(key, variant):
    tpl = np.asarray(MOTIF_POS[f"{key}_{variant}"], float)
    Q, t = _rand_rt(7)
    world = tpl @ Q.T + t
    out = transform_into_fg_data(key, world)
    assert out["key"] == f"{key}_{variant}"
    # and directly on the local coords
    assert assign_chirality(key, tpl) == f"{key}_{variant}"


def test_chirality_templates_are_distinct():
    for key in ("NS(=O)=O", "O=CNO"):
        a = np.asarray(MOTIF_POS[f"{key}_1"], float)
        b = np.asarray(MOTIF_POS[f"{key}_2"], float)
        rmsd = np.sqrt(((a - b) ** 2).sum(-1).mean())
        assert rmsd > 0.3, (key, rmsd)


def test_so3vec_roundtrip():
    from cbgbench_tpu.utils.so3 import so3vec_to_rotation
    import jax.numpy as jnp
    Q, _ = _rand_rt(3)
    v = rotation_to_so3vec(Q)
    R_back = np.asarray(so3vec_to_rotation(jnp.asarray(v)))
    assert np.abs(R_back - Q).max() < 1e-4


def test_decompose_covers_all_atoms_fixtures():
    from cbgbench_tpu.chem import read_sdf
    ligs = sorted(glob.glob(os.path.join(ASSETS, "*", "*_ligand.sdf")))
    for p in ligs:
        mol = read_sdf(p)[0]
        fgs = decompose_fg(mol)
        atoms = sorted(a for f in fgs for a in f["atoms"])
        assert atoms == list(range(mol.num_atoms)), p
        for f in fgs:
            assert f["wid"] in CLASS2FG or f["wid"] == FG2CLASS["Others"]
            if len(f["atoms"]) > 1:
                assert np.isfinite(f["v"]).all()

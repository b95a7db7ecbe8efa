"""Banded neighbor search + gather (ops/banded.py).

Covers: exactness vs the dense kNN when the band spans the receptor
block, bitwise gather equality for every payload dtype, Morton-sort
recall on a real pocket, and masked/padded-row behavior.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# retired experiment (BASELINE.md round-2b: banding is HBM-bound, not MXU-bound)
# moved out of the package; run manually: pytest scripts/test_banded_experiment.py
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from banded_experiment import (BandSpec, band_recall, band_starts,
                                     banded_applicable, banded_gather,
                                     banded_neighbors, morton_order,
                                     sort_protein_spatial)
from cbgbench_tpu.ops.knn import gather_neighbors, knn_neighbors


def _cloud(b=2, n=192, l=32, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(b, n, 3)).astype(np.float32) * 6
    mask = np.ones((b, n), bool)
    mask[0, n - 5:] = False            # padded tail in graph 0
    # receptor block Morton-sorted per graph (the banded precondition)
    for g in range(b):
        perm = morton_order(pos[g, l:])
        pos[g, l:] = pos[g, l:][perm]
    return jnp.asarray(pos), jnp.asarray(mask)


def test_morton_is_permutation_and_local():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(500, 3)) * 10
    perm = morton_order(pts)
    assert sorted(perm.tolist()) == list(range(500))
    # locality: mean distance between index-adjacent sorted points is far
    # below the cloud diameter
    s = pts[perm]
    step = np.linalg.norm(np.diff(s, axis=0), axis=-1).mean()
    diam = np.linalg.norm(pts.max(0) - pts.min(0))
    assert step < diam / 6


def test_full_cover_band_equals_dense_knn():
    """tile == receptor block, pad 0: candidates are ALL nodes in global
    order, so the banded search must equal the dense one exactly."""
    pos, mask = _cloud(n=192, l=32)
    spec = BandSpec(lig_cap=32, tile=160, pad=0)
    idx_e, val_e = knn_neighbors(pos, mask, 8)
    idx_b, val_b = banded_neighbors(pos, mask, 8, spec)
    np.testing.assert_array_equal(np.asarray(idx_e), np.asarray(idx_b))
    np.testing.assert_array_equal(np.asarray(val_e), np.asarray(val_b))


def test_banded_neighbors_are_true_knn_when_band_covers():
    """With a generous pad, every banded neighbor set matches exact kNN
    as a SET (tie order may differ between candidate layouts)."""
    pos, mask = _cloud(n=192, l=32)
    spec = BandSpec(lig_cap=32, tile=32, pad=64)
    idx_e, val_e = knn_neighbors(pos, mask, 8)
    idx_b, _ = banded_neighbors(pos, mask, 8, spec)
    ie, ib = np.asarray(idx_e), np.asarray(idx_b)
    ve = np.asarray(val_e)
    miss = 0
    for g in range(ie.shape[0]):
        for r in range(ie.shape[1]):
            if not mask[g, r]:
                continue
            miss += len(set(ie[g, r][ve[g, r]]) - set(ib[g, r]))
    total = int(ve.sum())
    assert miss / total < 0.02, f"banded recall too low: {miss}/{total}"


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "bool"])
def test_banded_gather_matches_dense(dtype):
    pos, mask = _cloud(n=192, l=32)
    spec = BandSpec(lig_cap=32, tile=32, pad=32)
    idx, _ = banded_neighbors(pos, mask, 8, spec)
    rng = np.random.default_rng(3)
    if dtype == "bool":
        x = jnp.asarray(rng.random((2, 192)) > 0.5)
    else:
        x = jnp.asarray(rng.normal(size=(2, 192, 16)),
                        dtype=jnp.bfloat16 if dtype == "bfloat16"
                        else jnp.float32)
    dense = gather_neighbors(x, idx)
    banded = banded_gather(x, idx, spec)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(banded))


def test_banded_gather_squeeze_matches():
    pos, mask = _cloud(n=192, l=32)
    spec = BandSpec(lig_cap=32, tile=32, pad=32)
    idx, _ = banded_neighbors(pos, mask, 8, spec)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 192)),
                    jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(gather_neighbors(x, idx)),
        np.asarray(banded_gather(x, idx, spec)))


def test_band_starts_clamped():
    spec = BandSpec(lig_cap=64, tile=64, pad=96)
    starts = band_starts(spec, 64 + 512)
    w = spec.width
    assert starts[0] == 64                       # clamped to block start
    assert starts[-1] == 64 + 512 - w            # clamped to block end
    for ti, lo in enumerate(starts):
        assert lo <= 64 + ti * 64 and lo + w >= 64 + (ti + 1) * 64


def test_banded_applicable():
    spec = BandSpec(lig_cap=64, tile=64, pad=96)
    assert banded_applicable(spec, 64 + 512)
    assert not banded_applicable(spec, 64 + 256)   # width ≥ receptor block
    assert not banded_applicable(spec, 64 + 500)   # tile misalignment


def test_real_pocket_recall():
    """Morton-sorted real pocket: pins the measured NEGATIVE result that
    retired the banded idea (module docstring) — recall at k=32 sits in
    the 0.7-0.9 range for practical widths (W=256: ~0.74, W=448: ~0.82),
    grows monotonically with pad, and only reaches 1.0 when the band
    covers the whole block. Far too lossy to replace exact kNN."""
    from cbgbench_tpu.chem.pdb import parse_pdb_pocket
    import glob
    pdbs = sorted(glob.glob("assets/examples/*/*.pdb"))
    assert pdbs, "no example pockets bundled"
    atoms, _residues = parse_pdb_pocket(pdbs[0])
    pos = np.asarray(atoms.pos, np.float32)
    n = (len(pos) // 64) * 64
    pos = pos[morton_order(pos)][:n]
    recalls = [float(band_recall(pos, 32, BandSpec(lig_cap=0, tile=64,
                                                   pad=pad)))
               for pad in (96, 192)]
    assert 0.60 < recalls[0] < 0.90, recalls
    assert recalls[1] > recalls[0], recalls
    assert recalls[1] < 0.95, recalls          # still lossy at W=448
    full = band_recall(pos, 32, BandSpec(lig_cap=0, tile=64,
                                         pad=(n - 64) // 2))
    assert float(full) == 1.0


def test_sort_protein_spatial_permutes_consistently():
    rng = np.random.default_rng(5)
    sample = {"protein": {"pos": rng.normal(size=(50, 3)),
                          "element": rng.integers(0, 5, 50),
                          "name": "x"},
              "ligand": {"pos": rng.normal(size=(9, 3))}}
    out = sort_protein_spatial(sample)
    perm = morton_order(np.asarray(sample["protein"]["pos"]))
    np.testing.assert_array_equal(out["protein"]["pos"],
                                  np.asarray(sample["protein"]["pos"])[perm])
    np.testing.assert_array_equal(out["protein"]["element"],
                                  np.asarray(sample["protein"]["element"])[perm])
    assert out["protein"]["name"] == "x"
    np.testing.assert_array_equal(out["ligand"]["pos"],
                                  sample["ligand"]["pos"])

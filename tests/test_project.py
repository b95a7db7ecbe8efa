"""Valence-aware pose projection (chem/project.py).

The projection must (a) turn poses whose distance-derived bond orders
violate the stability tables into stable ones, (b) leave already-stable
poses essentially untouched, and (c) never change the bond graph or move
atoms far from the sampled pose."""

import numpy as np

from cbgbench_tpu.chem.mol import Molecule
from cbgbench_tpu.chem.project import (bond_target_window,
                                       project_stable_pose)
from cbgbench_tpu.tools.geometry import _bond_order, check_stability


def _linear_chain(symbol_z, dists):
    """Atoms on the x-axis with the given consecutive gaps."""
    pos = np.zeros((len(symbol_z), 3))
    pos[1:, 0] = np.cumsum(dists)
    return pos


def test_window_roundtrips_through_bond_order():
    # every (pair, order) with a table entry: the target distance must
    # derive back to the intended stability order
    for s1, s2, order, want in [("C", "C", 1, 1), ("C", "C", 2, 2),
                                ("C", "C", 3, 3), ("C", "N", 1, 1),
                                ("C", "O", 2, 2), ("N", "N", 1, 1),
                                ("C", "C", 4, 1),  # aromatic reads single
                                ("C", "S", 1, 1), ("C", "Cl", 1, 1)]:
        t, lo, hi = bond_target_window(s1, s2, order)
        assert lo <= t <= hi, (s1, s2, order, t, lo, hi)
        assert _bond_order(s1, s2, t) == want, (s1, s2, order, t)


def test_projection_fixes_compressed_single_bond():
    # C-C at 1.30 A reads as a double bond; with 4 substituent carbons at
    # clean single-bond lengths the central atoms exceed valence 4
    m = Molecule(np.array([6, 6]), _linear_chain([6, 6], [1.30]),
                 bonds={(0, 1): 1})
    ok0, _, _ = check_stability(m.pos, m.atomic_numbers)
    # (two atoms with one perceived double bond is actually stable; build
    # the violating case: ethane compressed + a phantom neighbor)
    pos = np.array([[0.0, 0, 0], [1.30, 0, 0], [2.84, 0, 0]])
    m = Molecule(np.array([6, 6, 6]), pos, bonds={(0, 1): 1, (1, 2): 1})
    proj = project_stable_pose(m)
    d01 = np.linalg.norm(proj.pos[0] - proj.pos[1])
    assert _bond_order("C", "C", d01) == 1, d01
    ok, stable, n = check_stability(proj.pos, proj.atomic_numbers)
    assert ok, (stable, n)
    assert proj.bonds == m.bonds


def test_projection_separates_phantom_nonbonded_pair():
    # a non-bonded C...C pair at 1.5 A adds phantom valence to both ends;
    # projection must push it past the order-1 threshold (1.64 A)
    pos = np.array([[0.0, 0, 0], [1.54, 0, 0],
                    [1.54, 1.50, 0], [3.08, 1.50, 0]])
    m = Molecule(np.array([6, 6, 6, 6]), pos,
                 bonds={(0, 1): 1, (2, 3): 1})
    proj = project_stable_pose(m)
    d12 = np.linalg.norm(proj.pos[1] - proj.pos[2])
    assert d12 > 1.64, d12
    ok, stable, n = check_stability(proj.pos, proj.atomic_numbers)
    assert ok, (stable, n)


def test_projection_noop_on_stable_pose():
    # clean ethane-like chain: already stable, must barely move
    pos = _linear_chain([6, 6, 6], [1.54, 1.54])
    pos[2] = [1.54 + 1.54 * np.cos(1.2), 1.54 * np.sin(1.2), 0]
    m = Molecule(np.array([6, 6, 6]), pos, bonds={(0, 1): 1, (1, 2): 1})
    assert check_stability(m.pos, m.atomic_numbers)[0]
    proj = project_stable_pose(m)
    assert float(np.abs(proj.pos - m.pos).max()) < 0.05


def test_projection_improves_batch_stability():
    # randomized perturbed chains: projected mol_stable must dominate raw
    rng = np.random.default_rng(0)
    raw_ok = proj_ok = 0
    trials = 20
    for _ in range(trials):
        n = int(rng.integers(4, 9))
        # chain with noisy bond lengths around 1.45 (often reads double)
        gaps = rng.normal(1.45, 0.08, n - 1)
        pos = np.zeros((n, 3))
        pos[1:, 0] = np.cumsum(gaps)
        pos += rng.normal(0, 0.05, (n, 3))
        zs = rng.choice([6, 6, 6, 7, 8], n)
        bonds = {(i, i + 1): 1 for i in range(n - 1)}
        m = Molecule(zs, pos, bonds=bonds)
        raw_ok += int(check_stability(pos, zs)[0])
        p = project_stable_pose(m)
        proj_ok += int(check_stability(p.pos, zs)[0])
        # pose preserved: mean displacement small
        assert float(np.abs(p.pos - pos).mean()) < 0.35
    assert proj_ok > raw_ok, (proj_ok, raw_ok)
    assert proj_ok >= trials * 0.8, proj_ok


def test_projection_aromatic_ring():
    # benzene-like ring with compressed bonds (1.33 A reads double ->
    # ring carbons at valence 4 with substituents); projection moves ring
    # bonds into the aromatic window (>1.39) and keeps the ring closed
    n = 6
    r = 1.33 / (2 * np.sin(np.pi / n))
    ang = np.arange(n) * 2 * np.pi / n
    pos = np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(n)], -1)
    bonds = {(i, (i + 1) % n): 4 for i in range(n - 1)}
    bonds[(0, n - 1)] = 4
    m = Molecule(np.full(n, 6), pos, bonds=bonds)
    proj = project_stable_pose(m)
    for (i, j) in m.bonds:
        d = float(np.linalg.norm(proj.pos[i] - proj.pos[j]))
        assert _bond_order("C", "C", d) == 1, (i, j, d)
    assert check_stability(proj.pos, proj.atomic_numbers)[0]


def test_joint_projection_clears_receptor_and_keeps_stability():
    """rec_pos path (the --project_stable --declash joint solve): a
    stable chain shoved into a receptor wall must come out BOTH stable
    and clear of the 3.25 A clash band, in one projection."""
    n = 5
    pos = np.zeros((n, 3))
    pos[:, 0] = np.arange(n) * 1.5
    bonds = {(i, i + 1): 1 for i in range(n - 1)}
    m = Molecule(np.full(n, 6), pos, bonds=bonds)
    # receptor plane 1.0 A away from atoms 1-3 (deep in the clash band)
    rec = np.array([[1.5, 1.0, 0.0], [3.0, 1.0, 0.0], [4.5, 1.0, 0.0],
                    [1.5, 1.0, 1.5], [3.0, 1.0, 1.5]])
    proj = project_stable_pose(m, rec_pos=rec)
    d = np.linalg.norm(proj.pos[:, None] - rec[None], axis=-1)
    assert float(d.min()) >= 3.2, float(d.min())
    assert check_stability(proj.pos, proj.atomic_numbers)[0]
    # bond graph and atom order untouched
    assert proj.bonds == m.bonds


def test_restore_bonds_holds_generator_lengths_under_clearance_push():
    """restore_bonds: in-window bonds are pulled back to the GENERATOR's
    own lengths while the receptor hinge shoves the pose out of the
    pocket — the bond-length distribution must survive the joint solve
    (the SHAKE insight inside the solver; without it, in-window bonds
    drift freely and the flagship artifact paid +0.04 JSD_BL)."""
    n = 5
    pos = np.zeros((n, 3))
    # distinctive but in-window single-bond lengths the solve must keep
    gaps = np.array([1.48, 1.52, 1.55, 1.50])
    pos[1:, 0] = np.cumsum(gaps)
    bonds = {(i, i + 1): 1 for i in range(n - 1)}
    m = Molecule(np.full(n, 6), pos, bonds=bonds)
    rec = np.array([[1.5, 1.0, 0.0], [3.0, 1.0, 0.0], [4.5, 1.0, 0.0]])
    proj = project_stable_pose(m, rec_pos=rec, restore_bonds=True)
    d = np.linalg.norm(proj.pos[:, None] - rec[None], axis=-1)
    assert float(d.min()) >= 3.2, float(d.min())
    assert check_stability(proj.pos, proj.atomic_numbers)[0]
    new_gaps = np.linalg.norm(np.diff(proj.pos, axis=0), axis=-1)
    np.testing.assert_allclose(new_gaps, gaps, atol=0.02)


def test_restore_bonds_still_projects_violating_bond_to_window_edge():
    # a compressed bond (reads double) must still land in the single
    # window; restore_bonds targets clip(d0, lo, hi) = the window edge
    pos = np.array([[0.0, 0, 0], [1.30, 0, 0], [2.84, 0, 0]])
    m = Molecule(np.array([6, 6, 6]), pos, bonds={(0, 1): 1, (1, 2): 1})
    proj = project_stable_pose(m, restore_bonds=True)
    d01 = float(np.linalg.norm(proj.pos[0] - proj.pos[1]))
    assert _bond_order("C", "C", d01) == 1, d01
    assert check_stability(proj.pos, proj.atomic_numbers)[0]


def test_joint_projection_defaults_do_not_change_plain_path():
    """Without rec_pos the function's behavior (defaults included) is the
    r4 projection — existing artifacts stay reproducible."""
    n = 4
    pos = np.zeros((n, 3))
    pos[:, 0] = np.arange(n) * 1.2   # compressed singles
    bonds = {(i, i + 1): 1 for i in range(n - 1)}
    m = Molecule(np.full(n, 6), pos, bonds=bonds)
    a = project_stable_pose(m)
    b = project_stable_pose(m, rec_pos=None)
    np.testing.assert_array_equal(a.pos, b.pos)

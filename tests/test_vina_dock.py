"""Native Vina dock mode: torsion-tree kinematics, grid-map accuracy vs
the exact pairwise terms, and the crystal re-docking recovery protocol.

Reference protocol: repo/tools/docking_vina.py:137-151 ('dock' mode,
exhaustiveness 16); the improvement-ratio headline
(evaluate_scripts/cal_chem_results.py:51-60) is computed from docked
scores. Term math is shared with the pinned score_only path
(tests/test_vina_native.py).
"""

import os

import numpy as np
import pytest

from cbgbench_tpu.chem.mol import Molecule
from cbgbench_tpu.chem.pdb import parse_pdb_pocket
from cbgbench_tpu.chem.sdf import read_sdf
from cbgbench_tpu.tools import vina_dock as vd
from cbgbench_tpu.tools import vina_native as vn

EX = os.path.join(os.path.dirname(__file__), "..", "assets", "examples")


def _butane_like():
    """C0-C1-C2-C3 zigzag chain with one extra branch on C1: two
    rotatable bonds (C1-C2 only, by the degree>=2 rule C0-C1 and C2-C3
    are terminal)."""
    pos = np.array([[0.0, 0, 0], [1.5, 0, 0], [2.3, 1.3, 0],
                    [3.8, 1.3, 0]])
    m = Molecule(np.array([6, 6, 6, 6]), pos)
    m.add_bond(0, 1, 1)
    m.add_bond(1, 2, 1)
    m.add_bond(2, 3, 1)
    return m


def _dihedral(p0, p1, p2, p3):
    b0, b1, b2 = p1 - p0, p2 - p1, p3 - p2
    b1 = b1 / np.linalg.norm(b1)
    v = b0 - (b0 @ b1) * b1
    w = b2 - (b2 @ b1) * b1
    return np.arctan2(np.cross(v, w) @ b1, v @ w)


# --------------------------------------------------------- torsion tree

def test_torsion_tree_butane():
    m = _butane_like()
    tree = vd.build_torsion_tree(m)
    assert len(tree) == 1
    a, b, moved = tree[0]
    assert {a, b} == {1, 2}
    # the b-side of the cut moves (axis atom b is on the pivot, so its
    # rotation is a no-op); the a-side stays
    assert moved[b] and not moved[a]
    assert moved.sum() == 2


def test_apply_torsion_changes_dihedral_preserves_bonds():
    m = _butane_like()
    tree = vd.build_torsion_tree(m)
    d0 = _dihedral(*np.asarray(m.pos, float))
    ang = 0.7
    new = vd.apply_torsions(np.asarray(m.pos, float), tree, np.array([ang]))
    d1 = _dihedral(*new)
    # dihedral changed by exactly +-ang (sign depends on orientation)
    assert np.isclose(abs(((d1 - d0) + np.pi) % (2 * np.pi) - np.pi),
                      ang, atol=1e-8)
    # every bond length is untouched
    for (i, j) in m.bonds:
        before = np.linalg.norm(m.pos[i] - m.pos[j])
        after = np.linalg.norm(new[i] - new[j])
        assert np.isclose(before, after, atol=1e-9)


def test_torsion_tree_nested_branches():
    """A 7-atom chain C0..C6: inner bonds are rotors; rotating an inner
    parent bond must move the child subtree and child axes coherently
    (bond lengths everywhere preserved after multiple rotations)."""
    n = 7
    pos = np.zeros((n, 3))
    pos[:, 0] = np.arange(n) * 1.5
    pos[::2, 1] = 0.4
    m = Molecule(np.full(n, 6), pos)
    for i in range(n - 1):
        m.add_bond(i, i + 1, 1)
    tree = vd.build_torsion_tree(m)
    assert len(tree) == n - 3          # terminal bonds excluded
    rng = np.random.default_rng(0)
    angles = rng.uniform(-np.pi, np.pi, len(tree))
    new = vd.apply_torsions(np.asarray(m.pos, float), tree, angles)
    for (i, j) in m.bonds:
        assert np.isclose(np.linalg.norm(m.pos[i] - m.pos[j]),
                          np.linalg.norm(new[i] - new[j]), atol=1e-9)
    # 1-3 distances within each rigid triplet also preserved
    for i in range(n - 2):
        d_before = np.linalg.norm(m.pos[i] - m.pos[i + 2])
        d_after = np.linalg.norm(new[i] - new[i + 2])
        assert np.isclose(d_before, d_after, atol=1e-9)


def test_tree_ordering_root_outward():
    m = _butane_like()
    # root-outward: each bond's 'a' end is nearer the root than 'b'
    tree = vd.build_torsion_tree(m, root=0)
    a, b, moved = tree[0]
    assert a == 1 and b == 2 and moved[3] and not moved[0]


# ------------------------------------------------------------ intra term

def test_intra_excludes_1_4_and_closer():
    n = 6
    pos = np.zeros((n, 3))
    pos[:, 0] = np.arange(n) * 1.5
    m = Molecule(np.full(n, 6), pos)
    for i in range(n - 1):
        m.add_bond(i, i + 1, 1)
    intra = vd.IntraTerm(m)
    pairs = set(zip(intra.i.tolist(), intra.j.tolist()))
    assert (0, 4) in pairs and (0, 5) in pairs and (1, 5) in pairs
    assert (0, 3) not in pairs          # 1-4
    assert (0, 2) not in pairs          # 1-3
    assert len(pairs) == 3


def test_intra_constant_under_rigid_motion():
    m = _butane_like()
    intra = vd.IntraTerm(m)
    p = np.asarray(m.pos, float)
    e0 = intra.energy(p[None])[0]
    shifted = p + np.array([3.0, -2.0, 1.0])
    assert np.isclose(intra.energy(shifted[None])[0], e0, atol=1e-12)


# ------------------------------------------------------------- grid maps

def test_grid_matches_exact_pairwise():
    """Interpolated grid energy tracks the exact pairwise inter energy
    for random in-box poses of a small probe molecule."""
    rng = np.random.default_rng(1)
    rec_pos = rng.uniform(-6, 6, (40, 3))
    rec_typing = {
        "radius": np.full(40, 1.7),
        "hydrophobic": np.zeros(40, bool),
        "donor": np.zeros(40, bool),
        "acceptor": np.ones(40, bool),
        "heavy": np.ones(40, bool),
    }
    m = Molecule(np.array([6, 7]), np.array([[0.0, 0, 0], [1.4, 0, 0]]))
    m.add_bond(0, 1, 1)
    lt = vn.ligand_typing(m)
    grid = vd.VinaGrid(rec_pos, rec_typing, np.zeros(3), np.full(3, 4.0),
                       spacing=0.25)
    keys = grid.channel_ids(lt)
    for _ in range(10):
        shift = rng.uniform(-2.5, 2.5, 3)
        pose = np.asarray(m.pos, float) + shift
        approx = grid.energy(pose[None], keys, lt["heavy"])[0]
        terms = vn.pairwise_terms(pose, lt, rec_pos, rec_typing)
        exact = (vn.W_GAUSS1 * terms["gauss1"]
                 + vn.W_GAUSS2 * terms["gauss2"]
                 + vn.W_REPULSION * terms["repulsion"]
                 + vn.W_HYDROPHOBIC * terms["hydrophobic"]
                 + vn.W_HBOND * terms["hbond"])
        assert abs(approx - exact) < 0.15 + 0.05 * abs(exact), (
            approx, exact)


def test_grid_out_of_box_penalty():
    rec_pos = np.zeros((1, 3))
    rec_typing = {"radius": np.array([1.7]),
                  "hydrophobic": np.zeros(1, bool),
                  "donor": np.zeros(1, bool),
                  "acceptor": np.zeros(1, bool),
                  "heavy": np.ones(1, bool)}
    grid = vd.VinaGrid(rec_pos, rec_typing, np.zeros(3), np.full(3, 3.0),
                       spacing=0.5)
    m = Molecule(np.array([6]), np.zeros((1, 3)))
    keys = grid.channel_ids(vn.ligand_typing(m))
    inb = grid.energy(np.zeros((1, 1, 3)), keys, np.ones(1, bool))[0]
    far = grid.energy(np.full((1, 1, 3), 8.0), keys, np.ones(1, bool))[0]
    assert far > inb + 10.0            # quadratic wall


# ------------------------------------------------------------- dock e2e

def test_redock_recovers_perturbed_crystal():
    """The VERDICT acceptance test: perturb a crystal pose by ~2 Å
    translation + 30° rotation + torsion noise, dock seeded there, and
    recover to < 2 Å RMSD of the crystal with at least the crystal's
    affinity ballpark."""
    pdir = os.path.join(EX, "Eg5")
    if not os.path.isdir(pdir):
        pytest.skip("fixtures not present")
    mols = read_sdf(os.path.join(pdir, "3zcw_ligand.sdf"))
    pocket, _ = parse_pdb_pocket(os.path.join(pdir, "3zcw_protein.pdb"))
    typing = vn.typing_from_pocket(pocket)
    crystal = mols[0]
    crystal_pos = np.asarray(crystal.pos, float)
    crystal_aff = vn.score_only(crystal, pocket.pos, typing)["affinity"]

    rng = np.random.default_rng(7)
    tree = vd.build_torsion_tree(crystal)
    pert_pos = vd.apply_torsions(
        crystal_pos, tree, rng.uniform(-0.3, 0.3, len(tree)))
    axis = np.array([0.3, 0.8, -0.5])
    pert_pos = vd._rodrigues(pert_pos, pert_pos.mean(0),
                             axis / np.linalg.norm(axis),
                             np.deg2rad(30.0))
    pert_pos = pert_pos + np.array([1.2, -1.0, 1.1])    # ~1.9 Å shift
    pert = Molecule(crystal.atomic_numbers, pert_pos,
                    bonds=dict(crystal.bonds), aromatic=crystal.aromatic)
    rmsd_before = float(np.sqrt(np.mean(
        np.sum((pert_pos - crystal_pos) ** 2, -1))))
    assert rmsd_before > 2.0

    out = vd.dock(pert, pocket.pos, typing, exhaustiveness=4,
                  mc_steps=10, seed=3)
    rmsd_after = float(np.sqrt(np.mean(
        np.sum((out["pos"] - crystal_pos) ** 2, -1))))
    assert rmsd_after < 2.0, (rmsd_before, rmsd_after)
    assert out["affinity"] < crystal_aff + 1.0, (
        out["affinity"], crystal_aff)


def test_dock_never_worse_than_score_only_seed():
    """Seeded at the input pose, dock's exact-rescored best must be at
    least as good as the input pose's score-only inter energy (the
    run-0 chain starts there and only Metropolis-accepts)."""
    pdir = os.path.join(EX, "adrb1")
    if not os.path.isdir(pdir):
        pytest.skip("fixtures not present")
    mols = read_sdf(os.path.join(pdir, "2VT4_ligand.sdf"))
    pocket, _ = parse_pdb_pocket(os.path.join(pdir, "2VT4_protein.pdb"))
    typing = vn.typing_from_pocket(pocket)
    seed_aff = vn.score_only(mols[0], pocket.pos, typing)["affinity"]
    out = vd.dock(mols[0], pocket.pos, typing, exhaustiveness=2,
                  mc_steps=5, seed=0)
    # grid interpolation error can cost a whisker; allow 0.3 kcal
    assert out["affinity"] < seed_aff + 0.3, (out["affinity"], seed_aff)
    assert out["n_rot"] == vn.count_rotatable_bonds(mols[0])

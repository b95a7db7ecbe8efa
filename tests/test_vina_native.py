"""Native Vina score-only function: term-by-term pins against hand-computed
values + typing + rotor counting + an end-to-end crystal-ligand sanity band.

Reference protocol: repo/tools/docking_vina.py:137-151 (score_only mode);
the function itself is the published Vina potential (Trott & Olson 2010,
Table 1).
"""

import math
import os

import numpy as np
import pytest

from cbgbench_tpu.chem.mol import Molecule
from cbgbench_tpu.chem.pdb import parse_pdb_pocket
from cbgbench_tpu.chem.sdf import read_sdf
from cbgbench_tpu.tools import vina_native as vn

EX = os.path.join(os.path.dirname(__file__), "..", "assets", "examples")


# ---------------------------------------------------------------- terms

def test_gauss1_hand_values():
    # d=0 -> 1; d=0.5 -> e^-1; d=-0.5 symmetric
    d = np.array([0.0, 0.5, -0.5, 1.0])
    got = vn.term_gauss1(d)
    want = [1.0, math.exp(-1.0), math.exp(-1.0), math.exp(-4.0)]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_gauss2_hand_values():
    # centered at 3 with width 2: d=3 -> 1; d=1 -> e^-1; d=5 -> e^-1
    d = np.array([3.0, 1.0, 5.0])
    np.testing.assert_allclose(
        vn.term_gauss2(d), [1.0, math.exp(-1.0), math.exp(-1.0)], rtol=1e-12)


def test_repulsion_hand_values():
    d = np.array([-2.0, -0.5, 0.0, 1.0])
    np.testing.assert_allclose(vn.term_repulsion(d), [4.0, 0.25, 0.0, 0.0])


def test_hydrophobic_step():
    d = np.array([0.0, 0.5, 1.0, 1.5, 2.0])
    np.testing.assert_allclose(vn.term_hydrophobic(d),
                               [1.0, 1.0, 0.5, 0.0, 0.0])


def test_hbond_step():
    d = np.array([-1.0, -0.7, -0.35, 0.0, 0.5])
    np.testing.assert_allclose(vn.term_hbond(d), [1.0, 1.0, 0.5, 0.0, 0.0])


def test_published_weights():
    # the five weights + rotor penalty exactly as published
    assert vn.W_GAUSS1 == -0.035579
    assert vn.W_GAUSS2 == -0.005156
    assert vn.W_REPULSION == 0.840245
    assert vn.W_HYDROPHOBIC == -0.035069
    assert vn.W_HBOND == -0.587439
    assert vn.W_ROT == 0.05846
    assert vn.CUTOFF == 8.0


# ------------------------------------------------------------- full score

def _c2_mol(dist):
    """Two bonded carbons, one at origin; receptor typed separately."""
    m = Molecule(np.array([6, 6]), np.array([[0.0, 0, 0], [dist, 0, 0]]))
    m.add_bond(0, 1, 1)
    return m


def test_two_carbon_pair_hand_computed():
    """One ligand C vs one receptor hydrophobic C at r=4.0: d = 4 - 1.9 -
    1.9 = 0.2. Every term hand-computed."""
    lig = Molecule(np.array([6]), np.array([[0.0, 0.0, 0.0]]))
    rec_pos = np.array([[4.0, 0.0, 0.0]])
    rec_t = {"radius": np.array([1.9]), "hydrophobic": np.array([True]),
             "donor": np.array([False]), "acceptor": np.array([False]),
             "heavy": np.array([True])}
    out = vn.score_only(lig, rec_pos, rec_t)
    d = 4.0 - 1.9 - 1.9
    assert out["gauss1"] == pytest.approx(math.exp(-((d / 0.5) ** 2)))
    assert out["gauss2"] == pytest.approx(math.exp(-(((d - 3) / 2) ** 2)))
    assert out["repulsion"] == 0.0
    assert out["hydrophobic"] == pytest.approx(1.0)  # d=0.2 <= 0.5
    assert out["hbond"] == 0.0
    want_inter = (vn.W_GAUSS1 * out["gauss1"] + vn.W_GAUSS2 * out["gauss2"]
                  + vn.W_HYDROPHOBIC * 1.0)
    assert out["inter"] == pytest.approx(want_inter)
    assert out["n_rot"] == 0
    assert out["affinity"] == pytest.approx(want_inter)


def test_hbond_pair_and_rotor_penalty():
    """Ligand hydroxyl O (donor+acceptor) vs receptor backbone O
    (acceptor): only the donor->acceptor direction fires. d = 3.2-1.7-1.7
    = -0.2 -> hbond=0.2/0.7."""
    lig = Molecule(np.array([8, 6, 6]),
                   np.array([[0.0, 0, 0], [1.4, 0, 0], [2.9, 0, 0]]))
    lig.add_bond(0, 1, 1)
    lig.add_bond(1, 2, 1)
    rec_pos = np.array([[-3.2, 0.0, 0.0]])
    rec_t = {"radius": np.array([1.7]), "hydrophobic": np.array([False]),
             "donor": np.array([False]), "acceptor": np.array([True]),
             "heavy": np.array([True])}
    out = vn.score_only(lig, rec_pos, rec_t)
    assert out["hbond"] == pytest.approx(0.2 / 0.7)
    # C-O and C-C bonds: O end has degree 1 -> not rotatable; C-C has a
    # terminal carbon -> 0 rotors
    assert out["n_rot"] == 0


def test_cutoff_excludes_far_pairs():
    lig = Molecule(np.array([6]), np.array([[0.0, 0.0, 0.0]]))
    rec_pos = np.array([[8.5, 0.0, 0.0]])
    rec_t = {"radius": np.array([1.9]), "hydrophobic": np.array([True]),
             "donor": np.array([False]), "acceptor": np.array([False]),
             "heavy": np.array([True])}
    out = vn.score_only(lig, rec_pos, rec_t)
    assert out["inter"] == 0.0


# ------------------------------------------------------------- typing

def test_ligand_typing_hydrophobic_and_donor():
    # propane C-C-C: all hydrophobic; ethanol C-C-O: C1 polar, O donor+acc
    propane = _c2_mol(1.5)
    propane.atomic_numbers = np.array([6, 6, 6])
    propane.pos = np.array([[0.0, 0, 0], [1.5, 0, 0], [3.0, 0, 0]])
    propane.add_bond(1, 2, 1)
    t = vn.ligand_typing(propane)
    assert t["hydrophobic"].all()
    assert not t["donor"].any() and not t["acceptor"].any()

    ethanol = Molecule(np.array([6, 6, 8]),
                       np.array([[0.0, 0, 0], [1.5, 0, 0], [2.9, 0, 0]]))
    ethanol.add_bond(0, 1, 1)
    ethanol.add_bond(1, 2, 1)
    t = vn.ligand_typing(ethanol)
    assert bool(t["hydrophobic"][0]) is True     # CH3: C,H neighbors only
    assert bool(t["hydrophobic"][1]) is False    # bonded to O
    assert bool(t["donor"][2]) is True           # O-H (1 implicit H)
    assert bool(t["acceptor"][2]) is True


def test_ligand_typing_ether_O_not_donor():
    # C-O-C: O has full valence 2, no implicit H -> acceptor only
    ether = Molecule(np.array([6, 8, 6]),
                     np.array([[0.0, 0, 0], [1.4, 0, 0], [2.8, 0, 0]]))
    ether.add_bond(0, 1, 1)
    ether.add_bond(1, 2, 1)
    t = vn.ligand_typing(ether)
    assert bool(t["donor"][1]) is False
    assert bool(t["acceptor"][1]) is True


def test_protein_typing_tables():
    z = np.array([7, 8, 6, 6, 8, 7])
    names = ["N", "O", "CB", "CB", "OG", "NZ"]
    res = ["ALA", "ALA", "ALA", "SER", "SER", "LYS"]
    t = vn.protein_typing(z, names, res)
    assert bool(t["donor"][0]) is True       # backbone amide N
    assert bool(t["acceptor"][1]) is True    # backbone carbonyl O
    assert bool(t["hydrophobic"][2]) is True   # ALA CB
    assert bool(t["hydrophobic"][3]) is False  # SER CB bonds to OG
    assert t["donor"][4] and t["acceptor"][4]  # SER OG both
    assert bool(t["donor"][5]) is True       # LYS NZ
    assert bool(t["acceptor"][5]) is False


# ------------------------------------------------------------- rotors

def test_rotor_count_butane_and_amide():
    # butane C-C-C-C: one rotatable central bond
    but = Molecule(np.array([6, 6, 6, 6]),
                   np.array([[0.0, 0, 0], [1.5, 0, 0],
                             [3.0, 0, 0], [4.5, 0, 0]]))
    for i in range(3):
        but.add_bond(i, i + 1, 1)
    assert vn.count_rotatable_bonds(but) == 1

    # N-methylacetamide CH3-C(=O)-NH-CH3: amide bond excluded, the two
    # methyl bonds are terminal -> 0 rotors
    nma = Molecule(np.array([6, 6, 8, 7, 6]),
                   np.array([[0.0, 0, 0], [1.5, 0, 0], [2.1, 1.1, 0],
                             [2.2, -1.2, 0], [3.7, -1.3, 0]]))
    nma.add_bond(0, 1, 1)
    nma.add_bond(1, 2, 2)
    nma.add_bond(1, 3, 1)
    nma.add_bond(3, 4, 1)
    assert vn.count_rotatable_bonds(nma) == 0


def test_rotor_count_ring_bonds_excluded():
    # cyclohexane with an ethyl substituent: only the exocyclic C-C rotates
    pos = np.zeros((8, 3))
    pos[:, 0] = np.arange(8, dtype=float)
    m = Molecule(np.array([6] * 8), pos)
    for i in range(6):
        m.add_bond(i, (i + 1) % 6, 1)
    m.add_bond(0, 6, 1)
    m.add_bond(6, 7, 1)
    assert vn.count_rotatable_bonds(m) == 1


# ------------------------------------------------- crystal-ligand band

@pytest.mark.parametrize("target,pdb,sdf", [
    ("Eg5", "3zcw_protein.pdb", "3zcw_ligand.sdf"),
    ("adrb1", "2VT4_protein.pdb", "2VT4_ligand.sdf"),
])
def test_crystal_ligand_affinity_band(target, pdb, sdf):
    """Crystal poses of real complexes land in the published Vina band
    (roughly -4 .. -14 kcal/mol for drug-like ligands; VERDICT r3 cites
    ~-7). Guards typing/units/cutoff wiring end to end."""
    pdir = os.path.join(EX, target)
    if not os.path.isdir(pdir):
        pytest.skip("fixtures not present")
    mols = read_sdf(os.path.join(pdir, sdf))
    pocket, _ = parse_pdb_pocket(os.path.join(pdir, pdb))
    out = vn.score_only(mols[0], pocket.pos, vn.typing_from_pocket(pocket))
    assert -16.0 < out["affinity"] < -3.0, out
    assert out["n_rot"] >= 1
    # crystal poses should not be repulsion-dominated
    assert vn.W_REPULSION * out["repulsion"] < abs(out["inter"])


def test_minimize_rigid_monotone_and_recovers_perturbation():
    """Rigid local minimization must never worsen the inter energy, and
    must recover most of the affinity lost to a small rigid perturbation
    of a crystal pose."""
    import numpy as np
    pdir = os.path.join(EX, "Eg5")
    if not os.path.isdir(pdir):
        pytest.skip("fixtures not present")
    mols = read_sdf(os.path.join(pdir, "3zcw_ligand.sdf"))
    pocket, _ = parse_pdb_pocket(os.path.join(pdir, "3zcw_protein.pdb"))
    typing = vn.typing_from_pocket(pocket)
    crystal = vn.score_only(mols[0], pocket.pos, typing)["affinity"]

    # perturb: 0.6 A translation
    m = mols[0]
    from cbgbench_tpu.chem.mol import Molecule
    pert = Molecule(m.atomic_numbers,
                    (np.asarray(m.pos) + np.array([0.4, -0.3, 0.25],
                                                  np.float32)),
                    bonds=dict(m.bonds), aromatic=m.aromatic)
    before = vn.score_only(pert, pocket.pos, typing)["affinity"]
    out = vn.minimize_rigid(pert, pocket.pos, typing, steps=50)
    assert out["affinity"] <= before + 1e-6, (out["affinity"], before)
    # recover at least half of the perturbation loss (local minimum may
    # differ slightly from the crystal pose)
    assert out["affinity"] <= crystal + 0.5 * abs(before - crystal) + 0.3, (
        crystal, before, out["affinity"])
    assert out["rigid_shift"] < 2.0

"""Chemical-family perception (chem/families.py) vs hand-built molecules
and (RDKit-gated) the reference's BaseFeatures.fdef families
(/root/reference/repo/datasets/parsers/molecule_parser.py:17-35)."""

import glob

import numpy as np
import pytest

from cbgbench_tpu.chem.families import perceive_families
from cbgbench_tpu.chem.mol import Molecule


def _mol(zs, bonds, aromatic=None):
    n = len(zs)
    pos = np.zeros((n, 3))
    pos[:, 0] = np.arange(n) * 1.5        # geometry is irrelevant here
    m = Molecule(np.array(zs), pos,
                 bonds={(min(a, b), max(a, b)): o for a, b, o in bonds})
    if aromatic is not None:
        m.aromatic = np.array(aromatic, bool)
    return m


def test_donor_amine_and_alcohol():
    # ethanol C-C-O: O has one implicit H -> donor + acceptor
    m = _mol([6, 6, 8], [(0, 1, 1), (1, 2, 1)])
    fam = perceive_families(m)
    assert fam["Donor"][2] and fam["Acceptor"][2]
    # primary amine C-N: donor and acceptor
    m = _mol([6, 7], [(0, 1, 1)])
    fam = perceive_families(m)
    assert fam["Donor"][1] and fam["Acceptor"][1]


def test_ether_and_ketone_acceptor_not_donor():
    # ether C-O-C: acceptor, no H -> not donor
    m = _mol([6, 8, 6], [(0, 1, 1), (1, 2, 1)])
    fam = perceive_families(m)
    assert fam["Acceptor"][1] and not fam["Donor"][1]
    # ketone C-C(=O)-C
    m = _mol([6, 6, 8, 6], [(0, 1, 1), (1, 2, 2), (1, 3, 1)])
    fam = perceive_families(m)
    assert fam["Acceptor"][2] and not fam["Donor"][2]


def test_amide_nitrogen_not_acceptor_but_donor():
    # acetamide C-C(=O)-N: N has implicit H (donor) but the lone pair is
    # delocalized into the carbonyl (not an acceptor)
    m = _mol([6, 6, 8, 7], [(0, 1, 1), (1, 2, 2), (1, 3, 1)])
    fam = perceive_families(m)
    assert fam["Donor"][3]
    assert not fam["Acceptor"][3]
    assert fam["Acceptor"][2]              # the carbonyl O accepts


def test_pyridine_vs_pyrrole_nitrogen():
    ring6 = [(i, (i + 1) % 6, 4) for i in range(6)]
    pyridine = _mol([7, 6, 6, 6, 6, 6], ring6, aromatic=[1] * 6)
    fam = perceive_families(pyridine)
    assert fam["Acceptor"][0] and not fam["Donor"][0]
    ring5 = [(i, (i + 1) % 5, 4) for i in range(5)]
    # pyrrole N: aromatic bonds sum to 3 -> no implicit H under the
    # heavy-atom valence rule, but RDKit counts its H explicitly; what
    # matters for the acceptor rule is the delocalized lone pair
    pyrrole = _mol([7, 6, 6, 6, 6], ring5, aromatic=[1] * 5)
    fam = perceive_families(pyrrole)
    assert not fam["Acceptor"][0]


def test_nitro_oxygens_not_acceptors():
    # nitromethane C-N(=O)(=O): nitro O excluded
    m = _mol([6, 7, 8, 8], [(0, 1, 1), (1, 2, 2), (1, 3, 2)])
    fam = perceive_families(m)
    assert not fam["Acceptor"][2] and not fam["Acceptor"][3]


def test_furan_oxygen_not_acceptor():
    ring5 = [(i, (i + 1) % 5, 4) for i in range(5)]
    furan = _mol([8, 6, 6, 6, 6], ring5, aromatic=[1] * 5)
    fam = perceive_families(furan)
    assert not fam["Acceptor"][0]


def test_hydrophobe_chain_and_lumping():
    # pentane: all 5 carbons hydrophobe, lumped as one group
    m = _mol([6] * 5, [(i, i + 1, 1) for i in range(4)])
    fam = perceive_families(m)
    assert fam["Hydrophobe"].all()
    assert fam["LumpedHydrophobe"].all()
    # C attached to O is not hydrophobe; an isolated single hydrophobe C
    # is not lumped
    m = _mol([6, 8, 6], [(0, 1, 1), (1, 2, 1)])
    fam = perceive_families(m)
    assert not fam["Hydrophobe"].any()
    m = _mol([6, 6, 8], [(0, 1, 1), (1, 2, 1)])
    fam = perceive_families(m)
    assert fam["Hydrophobe"][0] and not fam["Hydrophobe"][1]
    assert not fam["LumpedHydrophobe"].any()


def test_benzene_ring_is_lumped_hydrophobe():
    ring6 = [(i, (i + 1) % 6, 4) for i in range(6)]
    m = _mol([6] * 6, ring6, aromatic=[1] * 6)
    fam = perceive_families(m)
    assert fam["Hydrophobe"].all() and fam["LumpedHydrophobe"].all()


# ---------------------------------------------------------------------
# RDKit-gated agreement table on the fixture ligands (same pattern as
# tests/test_aromatic.py): measured per-family agreement must be >= 90%
# and is printed so user environments record the number.
# ---------------------------------------------------------------------

@pytest.mark.parametrize("family", ["Donor", "Acceptor", "Hydrophobe"])
def test_rdkit_family_agreement(family):
    rdkit = pytest.importorskip("rdkit")
    import os

    from rdkit import Chem, RDConfig
    from rdkit.Chem import ChemicalFeatures

    from cbgbench_tpu.chem.sdf import read_sdf

    fdef = os.path.join(RDConfig.RDDataDir, "BaseFeatures.fdef")
    factory = ChemicalFeatures.BuildFeatureFactory(fdef)
    paths = sorted(glob.glob("assets/examples/*/*.sdf"))
    assert paths, "fixture ligands missing"
    agree = total = 0
    for p in paths:
        rd = Chem.MolFromMolFile(p, sanitize=False)
        Chem.SanitizeMol(rd)
        rd = Chem.RemoveHs(rd)
        ours = read_sdf(p)
        mol = ours[0] if isinstance(ours, list) else ours
        if rd.GetNumAtoms() != mol.num_atoms:
            continue
        ref = np.zeros(rd.GetNumAtoms(), bool)
        for feat in factory.GetFeaturesForMol(rd):
            if feat.GetFamily() == family:
                ref[list(feat.GetAtomIds())] = True
        fam = perceive_families(mol)[family]
        agree += int((fam == ref).sum())
        total += len(ref)
    assert total > 0
    pct = 100.0 * agree / total
    print(f"{family} agreement vs RDKit: {pct:.1f}% ({agree}/{total})")
    assert pct >= 90.0, f"{family} agreement {pct:.1f}% < 90%"

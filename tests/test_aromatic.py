"""Aromatic perception + featurization-delta quantification (VERDICT r2 #9).

The reference featurizes ligands via RDKit: SanitizeMol aromaticity +
GetHybridization + the ChemicalFeatures Aromatic family
(reference: repo/datasets/parsers/molecule_parser.py:17-90,
transforms/molecule_featurizer.py:14-38). This file pins our pure-python
equivalents on hand-built kekulized molecules where the RDKit answer is
unambiguous, measures the delta on the bundled fixture ligands, and — when
RDKit is importable — produces the exact per-field agreement table against
the reference recipe.
"""

import glob
import os

import numpy as np
import pytest

from cbgbench_tpu.chem.aromatic import perceive_aromatic
from cbgbench_tpu.chem.mol import Molecule
from cbgbench_tpu.chem.sdf import read_sdf
from cbgbench_tpu.data.featurize import featurize_ligand, infer_hybridization

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "assets", "examples")


def build(z, bonds):
    mol = Molecule(np.asarray(z, int), np.zeros((len(z), 3)))
    for i, j, c in bonds:
        mol.add_bond(i, j, c)
    return mol


# ---- hand-built kekulized molecules with unambiguous RDKit answers ----

def benzene():
    return build([6] * 6, [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1),
                           (4, 5, 2), (5, 0, 1)])


def pyridine():
    return build([7, 6, 6, 6, 6, 6],
                 [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2),
                  (5, 0, 1)])


def furan():
    return build([8, 6, 6, 6, 6],
                 [(0, 1, 1), (1, 2, 2), (2, 3, 1), (3, 4, 2), (4, 0, 1)])


def pyrrole():
    return build([7, 6, 6, 6, 6],
                 [(0, 1, 1), (1, 2, 2), (2, 3, 1), (3, 4, 2), (4, 0, 1)])


def thiophene():
    return build([16, 6, 6, 6, 6],
                 [(0, 1, 1), (1, 2, 2), (2, 3, 1), (3, 4, 2), (4, 0, 1)])


def imidazole():
    # N1-C2=N3-C4=C5-N1 (pyrrole-type N1 donates the lone pair)
    return build([7, 6, 7, 6, 6],
                 [(0, 1, 1), (1, 2, 2), (2, 3, 1), (3, 4, 2), (4, 0, 1)])


def naphthalene():
    bonds = [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2),
             (5, 6, 1), (6, 7, 2), (7, 8, 1), (8, 9, 2), (9, 0, 1),
             (4, 9, 1)]
    return build([6] * 10, bonds)


def cyclohexane():
    return build([6] * 6, [(i, (i + 1) % 6, 1) for i in range(6)])


def cyclohexene():
    return build([6] * 6, [(0, 1, 2)] + [(i, (i + 1) % 6, 1)
                                         for i in range(1, 6)])


def benzoquinone():
    # para-quinone: 2 in-ring C=C + 2 exocyclic C=O -> 4 pi, NOT aromatic
    return build([6, 6, 6, 6, 6, 6, 8, 8],
                 [(0, 1, 1), (1, 2, 2), (2, 3, 1), (3, 4, 1), (4, 5, 2),
                  (5, 0, 1), (0, 6, 2), (3, 7, 2)])


def tetrahydrofuran():
    return build([8, 6, 6, 6, 6], [(0, 1, 1), (1, 2, 1), (2, 3, 1),
                                   (3, 4, 1), (4, 0, 1)])


POSITIVE = [benzene, pyridine, furan, pyrrole, thiophene, imidazole,
            naphthalene]
NEGATIVE = [cyclohexane, cyclohexene, benzoquinone, tetrahydrofuran]


@pytest.mark.parametrize("factory", POSITIVE, ids=lambda f: f.__name__)
def test_aromatic_positive(factory):
    mol = factory()
    n_ring = 10 if factory is naphthalene else mol.num_atoms
    arom = perceive_aromatic(mol)
    assert arom[:n_ring].all(), factory.__name__


@pytest.mark.parametrize("factory", NEGATIVE, ids=lambda f: f.__name__)
def test_aromatic_negative(factory):
    mol = factory()
    assert not perceive_aromatic(mol).any(), factory.__name__


def test_class4_bonds_still_flag():
    mol = build([6] * 6, [(i, (i + 1) % 6, 4) for i in range(6)])
    assert perceive_aromatic(mol).all()


def test_hybridization_lone_pair_donors_are_sp2():
    """RDKit reports SP2 for furan O / pyrrole N (aromatic lone-pair
    donors); pure bond-order counting would say SP3 — the delta this
    round closes."""
    f = furan()
    f.aromatic = perceive_aromatic(f)
    assert infer_hybridization(f) == ["SP2"] * 5
    p = pyrrole()
    p.aromatic = perceive_aromatic(p)
    assert infer_hybridization(p) == ["SP2"] * 5
    thf = tetrahydrofuran()
    thf.aromatic = perceive_aromatic(thf)
    assert infer_hybridization(thf) == ["SP3"] * 5


# ---- fixture ligands: kekulized SDFs must yield aromatic atoms ----

def fixture_ligands():
    paths = sorted(glob.glob(os.path.join(EXAMPLES, "*", "*_ligand.sdf")))
    assert paths, "bundled example ligands missing"
    return [(os.path.basename(p), read_sdf(p)[0]) for p in paths]


def test_fixture_ligands_have_aromatic_atoms():
    """The bundled drug-like ligands contain aromatic rings stored
    KEKULIZED (zero class-4 bonds), so this fails without perception.
    Exception: the Eg5/3zcw SDF is defective in the reference itself —
    every bond is order 1 (verified identical to
    /root/reference/scripts/example/Eg5/3zcw_ligand.sdf), so RDKit's
    SanitizeMol finds no aromatic system there either."""
    for name, mol in fixture_ligands():
        assert not any(c == 4 for c in mol.bonds.values()), \
            f"{name}: fixture unexpectedly stores aromatic bonds"
        n_arom = int(np.sum(mol.aromatic))
        if any(c == 2 for c in mol.bonds.values()):
            assert n_arom >= 5, f"{name}: only {n_arom} aromatic atoms"
        else:
            assert name.startswith("3zcw"), name
            assert n_arom == 0
        # aromatic atoms must sit in 5/6-rings of the bond graph
        ring_atoms = set(a for r in mol.rings(max_size=6) for a in r)
        assert all((not mol.aromatic[i]) or (i in ring_atoms)
                   for i in range(mol.num_atoms))


def test_add_aromatic_mode_uses_perceived_flags():
    from cbgbench_tpu.constants.molecule import (
        MAP_ATOM_TYPE_AROMATIC_TO_INDEX)
    arom_classes = {v for (z, a), v in
                    MAP_ATOM_TYPE_AROMATIC_TO_INDEX.items() if a}
    for name, mol in fixture_ligands():
        if not any(c == 2 for c in mol.bonds.values()):
            continue        # 3zcw: defective all-single reference SDF
        atype = featurize_ligand(mol, mode="add_aromatic")["atype"]
        got = set(atype.tolist()) & arom_classes
        assert got, f"{name}: no aromatic classes in add_aromatic featurization"


# ---- the exact reference comparison, active once RDKit exists ----

def test_reference_agreement_table():
    pytest.importorskip("rdkit", reason="RDKit not in this image")
    """Per-field agreement vs the reference RDKit recipe
    (molecule_parser.py:17-90) on the fixture ligands. Prints the table;
    asserts the documented thresholds."""
    from rdkit import Chem, RDConfig
    from rdkit.Chem import ChemicalFeatures

    fdef = os.path.join(RDConfig.RDDataDir, "BaseFeatures.fdef")
    factory = ChemicalFeatures.BuildFeatureFactory(fdef)

    rows = []
    for path in sorted(glob.glob(os.path.join(EXAMPLES, "*",
                                              "*_ligand.sdf"))):
        rdmol = Chem.MolFromMolFile(path, sanitize=False)
        Chem.SanitizeMol(rdmol)
        rdmol = Chem.RemoveHs(rdmol)
        n = rdmol.GetNumAtoms()
        ref_arom = np.zeros(n, bool)
        for feat in factory.GetFeaturesForMol(rdmol):
            if feat.GetFamily() == "Aromatic":
                ref_arom[list(feat.GetAtomIds())] = True
        ref_hyb = [str(a.GetHybridization()) for a in rdmol.GetAtoms()]

        mol = read_sdf(path)[0]
        assert mol.num_atoms == n
        mol_hyb = infer_hybridization(mol)
        agree_arom = float(np.mean(mol.aromatic == ref_arom))
        agree_hyb = float(np.mean([a == b
                                   for a, b in zip(mol_hyb, ref_hyb)]))
        rows.append((os.path.basename(path), agree_arom, agree_hyb))
        print(f"{os.path.basename(path)}: aromatic {agree_arom:.3f} "
              f"hybridization {agree_hyb:.3f}")
    assert all(r[1] >= 0.95 for r in rows), rows
    assert all(r[2] >= 0.90 for r in rows), rows

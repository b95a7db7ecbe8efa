"""MOL2 parsing and the extension-dispatched ligand reader."""

import numpy as np

from cbgbench_tpu.chem import read_ligand, read_mol2
from cbgbench_tpu.data.dataset import RawPairDataset, example_pairs

MOL2 = "assets/examples/IMDPH/5OU3_ligand.mol2"


def test_read_mol2_atoms_bonds():
    m = read_mol2(MOL2)[0]
    assert m.num_atoms == 50                   # with explicit hydrogens
    assert len(m.bonds) == 53
    # element fallback for atom types without a dot (BR1 -> Br)
    assert 35 in set(m.atomic_numbers)         # bromine present
    assert m.formula() == "C23H20N5O2"


def test_read_ligand_strips_hydrogens():
    m = read_ligand(MOL2)[0]
    assert (m.atomic_numbers > 1).all()
    assert m.num_atoms == 30                   # heavy atoms only
    # bonds between heavy atoms survive the strip, H bonds dropped
    assert len(m.bonds) == 33
    assert m.valence_ok(slack=1)


def test_example_pairs_includes_imdph():
    pairs = example_pairs()
    assert len(pairs) == 5
    names = [p[1] for p in pairs]
    assert any(n.endswith("5OU3_ligand.mol2") for n in names)


def test_imdph_through_dataset():
    pairs = [p for p in example_pairs() if "IMDPH" in p[0]]
    ds = RawPairDataset(pairs, mode="add_aromatic", pocket_radius=10.0)
    s = ds.get(0, np.random.default_rng(0))
    assert len(s["ligand"]["atype"]) == 30
    assert len(s["protein"]["pos"]) > 100
    assert np.isfinite(s["ligand"]["pos"]).all()

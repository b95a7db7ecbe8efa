"""FLAG motif-vocabulary audit vs the reference vocab.txt inventory
(VERDICT r2 missing #2 tail).

The reference FLAG carries a fixed 549-motif SMILES vocabulary mined from
CrossDocked (reference: repo/utils/molecule/vocab.py + vocab.txt); this
rebuild harvests a signature vocabulary from the training ligands
(chem/moltree.MotifVocab). Without RDKit the SMILES keys cannot be
canonicalized directly, so the audit builds the reference's most frequent
motifs as explicit graphs, computes their signatures, and checks the
fixture-harvested vocabulary covers every reference top-motif that is
chemically present in the fixture ligands. It also pins the decomposition
invariant the assembly relies on (cliques cover all atoms; ring cliques
kept whole).
"""

import numpy as np
import pytest

from cbgbench_tpu.chem.mol import Molecule
from cbgbench_tpu.chem.moltree import MotifVocab, motif_signature, tree_decomp


def build(z, bonds):
    mol = Molecule(np.asarray(z, int), np.zeros((len(z), 3)))
    for i, j, c in bonds:
        mol.add_bond(i, j, c)
    return mol


# the reference vocabulary's top motifs (vocab.txt line: SMILES:count),
# expressed as element/bond graphs
REF_TOP_MOTIFS = {
    "CC:108150": build([6, 6], [(0, 1, 1)]),
    "CN:59667": build([6, 7], [(0, 1, 1)]),
    "CO:39300": build([6, 8], [(0, 1, 1)]),
    "C=O:36148": build([6, 8], [(0, 1, 2)]),
    "benzene:17649": build([6] * 6, [(0, 1, 2), (1, 2, 1), (2, 3, 2),
                                     (3, 4, 1), (4, 5, 2), (5, 0, 1)]),
    "C=N:2305": build([6, 7], [(0, 1, 2)]),
    "pyrrolidine:2115": build([6, 6, 6, 7, 6],
                              [(i, (i + 1) % 5, 1) for i in range(5)]),
    "pyridine:1892": build([6, 6, 6, 6, 7, 6],
                           [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1),
                            (4, 5, 2), (5, 0, 1)]),
    "CS:4246": build([6, 16], [(0, 1, 1)]),
    "NS:1824": build([7, 16], [(0, 1, 1)]),
}


@pytest.fixture(scope="module")
def harvested():
    from cbgbench_tpu.cli.train_cli import build_dataset
    from cbgbench_tpu.sampling.flag_sample import vocab_from_dataset
    ds = build_dataset({"raw_path": "assets/examples",
                        "pocket_radius": 10.0}, mode="basic")
    return vocab_from_dataset(ds)


def test_vocab_covers_reference_top_motifs(harvested):
    """Every reference top motif whose signature occurs in the fixture
    ligands must be a harvested vocabulary entry; report the inventory."""
    present, absent = [], []
    for name, mol in REF_TOP_MOTIFS.items():
        clique = list(range(mol.num_atoms))
        sig = motif_signature(mol, clique)
        (present if sig in harvested.key_to_id else absent).append(
            f"{name} -> {sig}")
    print(f"harvested vocab size: {harvested.size()}")
    print("present:", present)
    print("absent:", absent)
    # the universal organic motifs must be present on any drug-like corpus
    must = ["CC:", "CN:", "CO:", "C=O:", "benzene:"]
    missing = [m for m in must
               if not any(p.startswith(m) for p in present)]
    assert not missing, f"core reference motifs absent: {missing}"
    # a 5-ligand corpus cannot cover 549 motifs — but it must cover a
    # meaningful slice of the head of the reference inventory
    assert len(present) >= 6, (present, absent)


def test_decomposition_covers_all_atoms(harvested):
    from cbgbench_tpu.cli.train_cli import build_dataset
    from cbgbench_tpu.data.flag_data import mol_from_featurized
    ds = build_dataset({"raw_path": "assets/examples",
                        "pocket_radius": 10.0}, mode="basic")
    rng = np.random.default_rng(0)
    for i in range(len(ds)):
        mol = mol_from_featurized(ds.get(i, rng)["ligand"])
        cliques, edges = tree_decomp(mol)
        covered = set(a for c in cliques for a in c)
        assert covered == set(range(mol.num_atoms))
        for c in cliques:
            assert harvested.get(mol, c) >= 0, \
                "harvested vocab must contain every training clique"

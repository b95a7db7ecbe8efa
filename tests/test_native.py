"""Native (C++) host data-plane tests: exact parity with the pure-python
parsers on every fixture, plus the fallback path."""

import glob
import os
import unittest.mock as um

import numpy as np
import pytest

import cbgbench_tpu.chem.pdb as P
import cbgbench_tpu.native as native
from cbgbench_tpu.chem import read_sdf
from cbgbench_tpu.chem.bonds import perceive_bonds

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "examples")
PDBS = sorted(glob.glob(os.path.join(ASSETS, "*", "*_protein.pdb")))
SDFS = sorted(glob.glob(os.path.join(ASSETS, "*", "*_ligand.sdf")))

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="no C++ toolchain")


@needs_native
@pytest.mark.parametrize("pdb", PDBS, ids=[os.path.basename(p)
                                           for p in PDBS])
def test_pdb_parity(pdb):
    text = open(pdb).read()
    a_nat, r_nat = P.parse_pdb_pocket(text)
    with um.patch.object(native, "available", lambda: False):
        a_py, r_py = P.parse_pdb_pocket(text)
    assert (a_nat.element == a_py.element).all()
    np.testing.assert_allclose(a_nat.pos, a_py.pos, atol=1e-3)
    assert (a_nat.is_backbone == a_py.is_backbone).all()
    assert (a_nat.atom_to_aa_type == a_py.atom_to_aa_type).all()
    assert (a_nat.res_id == a_py.res_id).all()
    assert a_nat.atom_name == a_py.atom_name
    assert (r_nat.aa == r_py.aa).all()
    np.testing.assert_allclose(r_nat.pos_heavyatom, r_py.pos_heavyatom,
                               atol=1e-3)
    assert (r_nat.mask_heavyatom == r_py.mask_heavyatom).all()
    assert (r_nat.res_nb == r_py.res_nb).all()
    assert (r_nat.chain_nb == r_py.chain_nb).all()


@needs_native
@pytest.mark.parametrize("sdf", SDFS, ids=[os.path.basename(p)
                                           for p in SDFS])
def test_sdf_parity(sdf):
    out = native.parse_sdf_v2000(open(sdf).read())
    assert out is not None
    z, pos, bonds = out
    mol = read_sdf(sdf)[0]
    assert (z == mol.atomic_numbers).all()
    np.testing.assert_allclose(pos, mol.pos, atol=1e-4)
    got = {(min(i, j), max(i, j)): o for i, j, o in bonds.tolist()}
    assert got == mol.bonds


@needs_native
def test_perceive_bonds_parity():
    for sdf in SDFS:
        mol = read_sdf(sdf)[0]
        out = native.perceive_bonds_native(mol.atomic_numbers, mol.pos)
        assert out is not None
        bi, bj = out
        pymol = perceive_bonds(mol.atomic_numbers, mol.pos)
        assert set(zip(bi.tolist(), bj.tolist())) == set(pymol.bonds)


def test_python_fallback_works():
    """parse_pdb_pocket must work with the native layer unavailable."""
    with um.patch.object(native, "available", lambda: False):
        atoms, residues = P.parse_pdb_pocket(open(PDBS[0]).read())
    assert len(atoms.element) > 100
    assert residues.pos_heavyatom.shape[1:] == (15, 3)

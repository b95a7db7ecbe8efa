"""Mock-driven coverage of the externally-gated host paths.

The image has no vina/meeko/rdkit/plip/obabel binaries, so these paths
(`tools/docking.py`, the PLIP XML parse in `tools/interaction.py`, the
`--vina` aggregation in `cli/evaluate_cli.py`) had never executed. Here
fake `vina`/`meeko`/`rdkit` modules plus monkeypatched `shutil.which` /
`subprocess.run` drive them end-to-end:

 * VinaDockingTask.run through all 3 modes, with and without pdb2pqr
   (reference protocol: repo/tools/docking_vina.py:250-273,
   evaluate_scripts/evaluate_chem_single.py:44-59)
 * evaluate_cli --vina aggregation: per-mode means, improvement %,
   delta-binding %, ligand efficiency, and null-gated keys
   (reference: evaluate_scripts/cal_chem_results.py:51-60)
 * plip_analysis XML parsing from a canned report
   (reference: repo/tools/interaction.py:57-93)
"""

import json
import os
import subprocess
import sys
import types
from collections import deque

import numpy as np
import pytest

from cbgbench_tpu.chem.sdf import read_sdf, write_sdf

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "assets", "examples",
                       "Eg5")
LIGAND_SDF = os.path.join(FIXTURE, "3zcw_ligand.sdf")
PROTEIN_PDB = os.path.join(FIXTURE, "3zcw_protein.pdb")


# ---------------------------------------------------------------------------
# fake external toolchain
# ---------------------------------------------------------------------------

class _FakeVina:
    """Mimics vina.Vina: scores are served from the module-level SCRIPT
    queue in (score_only, minimize, dock) call order."""
    SCRIPT = deque()
    calls = []

    def __init__(self, sf_name="vina", verbosity=0):
        self.sf_name = sf_name

    def set_receptor(self, path):
        _FakeVina.calls.append(("receptor", os.path.basename(path)))
        assert os.path.exists(path), "receptor pdbqt must have been written"

    def set_ligand_from_file(self, path):
        _FakeVina.calls.append(("ligand", os.path.basename(path)))
        assert os.path.exists(path), "ligand pdbqt must have been written"

    def compute_vina_maps(self, center, box_size):
        assert len(center) == 3 and len(box_size) == 3

    def score(self):
        return [_FakeVina.SCRIPT.popleft()]

    def optimize(self):
        return [_FakeVina.SCRIPT.popleft()]

    def dock(self, exhaustiveness, n_poses):
        assert exhaustiveness == 16      # the reference protocol constant
        self._docked = _FakeVina.SCRIPT.popleft()

    def energies(self, n_poses):
        return [[self._docked]]

    def poses(self, n_poses):
        return "MODEL 1\nENDMDL\n"


class _FakePreparation:
    def prepare(self, rdmol):
        self.mol = rdmol

    def write_pdbqt_file(self, path):
        with open(path, "w") as f:
            f.write("REMARK fake ligand pdbqt\n")


class _FakeRDMol:
    pass


def _fake_subprocess_run(cmd, check=True, capture_output=True, **kw):
    """pdb2pqr writes argv[-1]; obabel writes the -O target."""
    prog = os.path.basename(cmd[0])
    if prog.startswith("pdb2pqr"):
        out = cmd[-1]
    elif prog == "obabel":
        out = cmd[cmd.index("-O") + 1]
    else:
        raise AssertionError(f"unexpected subprocess: {cmd}")
    with open(out, "w") as f:
        f.write(f"REMARK fake {prog} output\n")
    _fake_subprocess_run.calls.append(cmd)
    return subprocess.CompletedProcess(cmd, 0, b"", b"")


@pytest.fixture
def vina_toolchain(monkeypatch):
    """Installs fake vina/meeko/rdkit modules and fake binaries."""
    fake_vina = types.ModuleType("vina")
    fake_vina.Vina = _FakeVina
    fake_meeko = types.ModuleType("meeko")
    fake_meeko.MoleculePreparation = _FakePreparation
    fake_rdkit = types.ModuleType("rdkit")
    fake_chem = types.ModuleType("rdkit.Chem")
    fake_chem.SDMolSupplier = lambda path, removeHs=False: [_FakeRDMol()]
    fake_chem.AddHs = lambda m, addCoords=True: m
    fake_rdkit.Chem = fake_chem
    for name, mod in [("vina", fake_vina), ("meeko", fake_meeko),
                      ("rdkit", fake_rdkit), ("rdkit.Chem", fake_chem)]:
        monkeypatch.setitem(sys.modules, name, mod)

    binaries = {"obabel": "/usr/bin/obabel", "pdb2pqr30": "/usr/bin/pdb2pqr30"}
    # scope the patches to the docking module — a global subprocess.run
    # patch intercepts unrelated library calls (e.g. numpy's lscpu probe)
    from cbgbench_tpu.tools import docking
    fake_shutil = types.SimpleNamespace(which=lambda b: binaries.get(b))
    fake_subprocess = types.SimpleNamespace(
        run=_fake_subprocess_run,
        CompletedProcess=subprocess.CompletedProcess)
    monkeypatch.setattr(docking, "shutil", fake_shutil)
    monkeypatch.setattr(docking, "subprocess", fake_subprocess)
    _fake_subprocess_run.calls = []
    _FakeVina.SCRIPT = deque()
    _FakeVina.calls = []
    return binaries


def _ligand():
    mols = read_sdf(LIGAND_SDF)
    assert mols
    return mols[0]


# ---------------------------------------------------------------------------
# VinaDockingTask
# ---------------------------------------------------------------------------

def test_docking_available_reports_fake_toolchain(vina_toolchain):
    from cbgbench_tpu.tools import docking
    caps = docking.available()
    assert caps["vina_python"] and caps["meeko"] and caps["obabel"]
    assert caps["pdb2pqr"] and not caps["vina_binary"]


def test_vina_task_all_three_modes(vina_toolchain):
    from cbgbench_tpu.tools.docking import VinaDockingTask
    mol = _ligand()
    _FakeVina.SCRIPT = deque([-5.2, -6.1, -7.3])
    task = VinaDockingTask(mol, PROTEIN_PDB)
    assert task.ready
    assert np.allclose(task.center, mol.pos.mean(0), atol=1e-6)

    r = task.run("score_only")
    assert r.score_only == -5.2 and r.minimize is None and r.dock is None
    r = task.run("minimize")
    assert r.minimize == -6.1
    r = task.run("dock")
    assert r.dock == -7.3 and "MODEL" in r.pose

    # receptor prep route: pdb2pqr (ff=AMBER) then obabel -xr, per run
    progs = [os.path.basename(c[0]) for c in _fake_subprocess_run.calls]
    assert progs == ["pdb2pqr30", "obabel"] * 3
    assert "--ff=AMBER" in _fake_subprocess_run.calls[0]
    assert "-xr" in _fake_subprocess_run.calls[1]
    with pytest.raises(ValueError):
        task.run("bogus_mode")


def test_vina_prepare_without_pdb2pqr(vina_toolchain, monkeypatch):
    """Fallback receptor route: raw PDB straight through obabel."""
    from cbgbench_tpu.tools import docking
    monkeypatch.setattr(
        docking.shutil, "which",
        lambda b: "/usr/bin/obabel" if b == "obabel" else None)
    from cbgbench_tpu.tools.docking import VinaDockingTask
    _FakeVina.SCRIPT = deque([-4.0])
    task = VinaDockingTask(_ligand(), PROTEIN_PDB)
    assert task.run("score_only").score_only == -4.0
    cmds = _fake_subprocess_run.calls
    assert len(cmds) == 1 and os.path.basename(cmds[0][0]) == "obabel"
    assert cmds[0][1] == PROTEIN_PDB      # raw pdb, no pqr intermediate


def test_vina_task_not_ready_without_toolchain():
    """On this bare image the task must refuse loudly, not half-run."""
    from cbgbench_tpu.tools.docking import VinaDockingTask, available
    caps = available()
    if caps["vina_python"]:
        pytest.skip("real vina present")
    task = VinaDockingTask(_ligand(), PROTEIN_PDB)
    assert not task.ready
    with pytest.raises(RuntimeError, match="unavailable"):
        task.run("dock")


# ---------------------------------------------------------------------------
# evaluate_cli --vina aggregation
# ---------------------------------------------------------------------------

def _make_result_root(tmp_path, n_gen=2):
    root = tmp_path / "results"
    pocket = root / "0000_3zcw_ligand"
    pocket.mkdir(parents=True)
    mol = _ligand()
    for i in range(n_gen):
        write_sdf(str(pocket / f"{i:04d}.sdf"), mol)
    with open(root / "summary.json", "w") as f:
        json.dump([{"index": 0, "n_samples": n_gen}], f)
    return str(root)


def test_evaluate_folder_vina_aggregation(vina_toolchain, tmp_path):
    from cbgbench_tpu.cli.evaluate_cli import evaluate_folder

    # serve: ref (score,min,dock) then gen1, gen2 — gen1 better, gen2 worse
    _FakeVina.SCRIPT = deque([
        -5.0, -5.5, -6.0,     # reference ligand
        -6.0, -6.5, -7.0,     # gen 0: improves every mode
        -4.0, -4.5, -5.0,     # gen 1: worse in every mode
    ])
    root = _make_result_root(tmp_path)
    report = evaluate_folder(
        root, protein_lookup=lambda name: (PROTEIN_PDB, LIGAND_SDF),
        run_vina=True)

    assert report["vina_available"] is True
    assert report["validity"] == 1.0
    assert report["vina_score_only_mean"] == pytest.approx(-5.0)
    assert report["vina_minimize_mean"] == pytest.approx(-5.5)
    assert report["vina_dock_mean"] == pytest.approx(-6.0)
    # improvement = (gen - ref)/ref, ref < 0 (cal_chem_results.py:55-60):
    # dock: ((-7+6)/-6 + (-5+6)/-6)/2 = (1/6 - 1/6)/2 = 0
    assert report["vina_dock_improvement_pct"] == pytest.approx(0.0, abs=1e-9)
    assert report["vina_dock_delta_binding_pct"] == pytest.approx(50.0)
    n_atoms = _ligand().num_atoms
    assert report["vina_lig_efficiency_mean"] == pytest.approx(
        np.mean([-7.0 / n_atoms, -5.0 / n_atoms]))
    assert not _FakeVina.SCRIPT, "every scripted affinity consumed"


def test_evaluate_folder_vina_null_gated(tmp_path):
    """Without the toolchain the keys exist and are null (the in-tree
    metrics.json contract every round-2 artifact relies on)."""
    from cbgbench_tpu.cli.evaluate_cli import evaluate_folder
    root = _make_result_root(tmp_path)
    report = evaluate_folder(
        root, protein_lookup=lambda name: (PROTEIN_PDB, LIGAND_SDF),
        run_vina=True)     # requested, but toolchain absent
    if report["vina_available"]:
        pytest.skip("real vina present")
    for mode in ("score_only", "minimize", "dock"):
        assert report[f"vina_{mode}_mean"] is None
        assert report[f"vina_{mode}_improvement_pct"] is None
        assert report[f"vina_{mode}_delta_binding_pct"] is None
    assert report["vina_lig_efficiency_mean"] is None


def test_vina_all_modes_swallow_per_mode_failure(vina_toolchain):
    """A mode that raises yields None for that mode, not a crash
    (reference: evaluate_chem_single.py wraps each mode in try/except)."""
    from cbgbench_tpu.cli.evaluate_cli import _vina_all_modes
    _FakeVina.SCRIPT = deque([-5.0])   # only score_only is served
    out = _vina_all_modes(_ligand(), PROTEIN_PDB, [0.0, 0.0, 0.0])
    assert out["score_only"] == -5.0
    assert out["minimize"] is None and out["dock"] is None


# ---------------------------------------------------------------------------
# PLIP XML parse
# ---------------------------------------------------------------------------

PLIP_XML = """<?xml version="1.0"?>
<report>
 <bindingsite id="1">
  <interactions>
   <hydrophobic_interactions>
    <hydrophobic_interaction id="1"><dist>3.7</dist></hydrophobic_interaction>
    <hydrophobic_interaction id="2"><dist>3.9</dist></hydrophobic_interaction>
   </hydrophobic_interactions>
   <hydrogen_bonds>
    <hydrogen_bond id="1"><dist>2.9</dist></hydrogen_bond>
   </hydrogen_bonds>
   <water_bridges>
    <water_bridge id="1"/>
   </water_bridges>
   <pi_stacks>
    <pi_stack id="1"/><pi_stack id="2"/><pi_stack id="3"/>
   </pi_stacks>
   <halogen_bonds/>
  </interactions>
 </bindingsite>
</report>
"""


def test_plip_analysis_parses_canned_xml(monkeypatch):
    from cbgbench_tpu.tools import interaction

    def fake_plip_run(cmd, check=True, capture_output=True, **kw):
        assert cmd[0] == "plip" and "-x" in cmd
        outdir = cmd[cmd.index("-o") + 1]
        complex_pdb = cmd[cmd.index("-f") + 1]
        text = open(complex_pdb).read()
        assert "HETATM" in text and "LIG L 999" in text  # merged ligand
        with open(os.path.join(outdir, "report.xml"), "w") as f:
            f.write(PLIP_XML)
        return subprocess.CompletedProcess(cmd, 0, b"", b"")

    monkeypatch.setattr(interaction.subprocess, "run", fake_plip_run)
    counts = interaction.plip_analysis(_ligand(), PROTEIN_PDB)
    assert counts == {"hydrophobic": 2, "hbond": 1, "waterbridge": 1,
                      "pistack": 3, "pication": 0, "halogen": 0, "metal": 0}


def test_analyze_interactions_prefers_plip_then_falls_back(monkeypatch):
    from cbgbench_tpu.tools import interaction
    mol = _ligand()

    monkeypatch.setattr(interaction, "plip_available", lambda: True)
    monkeypatch.setattr(interaction, "plip_analysis",
                        lambda m, p: {k: 1 for k in
                                      interaction.INTERACTION_TYPES})
    out = interaction.analyze_interactions(mol, protein_pdb=PROTEIN_PDB)
    assert all(v == 1 for v in out.values())

    # PLIP crashing must fall through to the geometric profile
    def boom(m, p):
        raise subprocess.CalledProcessError(1, "plip")
    monkeypatch.setattr(interaction, "plip_analysis", boom)
    out = interaction.analyze_interactions(mol, protein_pdb=PROTEIN_PDB)
    assert set(out) == set(interaction.INTERACTION_TYPES)
    assert out["hydrophobic"] > 0    # crystal ligand contacts its pocket


# ---------------------------------------------------------------------------
# RDKit-gated paths — activate the moment the dependency appears
# ---------------------------------------------------------------------------

def test_rdkit_refine_and_validity():
    pytest.importorskip("rdkit", reason="rdkit not in this image")
    from cbgbench_tpu.chem.rdkit_bridge import refine_molecule, rdkit_validity
    mol = _ligand()
    refined = refine_molecule(mol)
    assert refined.num_atoms >= 8
    assert rdkit_validity(refined)


def test_rdkit_sascorer_matches_range():
    pytest.importorskip("rdkit", reason="rdkit not in this image")
    from cbgbench_tpu.tools.sascorer_rdkit import calculate_sa
    from cbgbench_tpu.chem.rdkit_bridge import to_rdkit
    sa = calculate_sa(to_rdkit(_ligand(), sanitize=True))
    assert 1.0 <= sa <= 10.0

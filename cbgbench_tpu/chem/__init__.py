from .mol import Molecule  # noqa: F401
from .sdf import read_sdf, write_sdf  # noqa: F401
from .mol2 import read_mol2, read_ligand  # noqa: F401
from .pdb import parse_pdb_pocket  # noqa: F401
from .bonds import perceive_bonds  # noqa: F401
from .reconstruct import reconstruct_molecule, evaluate_validity  # noqa: F401


def __getattr__(name):
    # Lazy: chem.project needs the stability tables in tools.geometry,
    # which itself imports chem.mol — an eager import here closes a
    # circular chain (tools.geometry -> chem -> chem.project ->
    # tools.geometry) whenever tools is imported first (evaluate_cli).
    if name == "project_stable_pose":
        from .project import project_stable_pose
        return project_stable_pose
    raise AttributeError(name)

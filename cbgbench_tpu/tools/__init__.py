from .geometry import (bond_length_profile, eval_bond_length_jsd,
                       bond_angle_profile, eval_bond_angle_jsd,
                       check_stability, detect_clash, eval_steric_clash,
                       pair_length_profile, eval_pair_length_jsd)  # noqa: F401
from .substructure import atom_type_distribution, ring_size_distribution  # noqa: F401
from .scoring import get_chem  # noqa: F401

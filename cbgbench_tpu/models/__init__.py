from ._base import get_model, sample_time  # noqa: F401
from . import targetdiff, diffbp, diffsbdd, d3fg  # noqa: F401  (registration)
from . import pocket2mol, graphbp, flag  # noqa: F401  (registration)

from ._base import get_model, sample_time  # noqa: F401
from . import targetdiff  # noqa: F401  (registration side effects)

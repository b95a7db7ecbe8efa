from .schedules import make_beta_schedule, VPTables  # noqa: F401
from .ctn import CTNVPScheduler, CTNVEScheduler  # noqa: F401
from .type_diff import TypeVPScheduler, MaskTypeScheduler  # noqa: F401
from .rot import RotVPScheduler  # noqa: F401
from .variational import VariationalScheduler  # noqa: F401

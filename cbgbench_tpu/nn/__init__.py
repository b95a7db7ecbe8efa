from .common import MLP, ShiftedSoftplus, SinusoidalPosEmb  # noqa: F401
from .embedders import PLContextEmbedder  # noqa: F401
from .unitransformer import UniTransformer  # noqa: F401

from .knn import knn_neighbors, gather_neighbors  # noqa: F401
from .rbf import GaussianSmearingTable, gaussian_smearing  # noqa: F401
from .segment import masked_mean, masked_softmax  # noqa: F401

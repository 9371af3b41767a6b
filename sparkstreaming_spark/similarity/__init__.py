from .ivf import ivf_knn
from .knn import brute_force_knn, lsh_knn

__all__ = ["brute_force_knn", "ivf_knn", "lsh_knn"]

from .index import append_to_ivf_index, build_ivf_index, query_ivf_index
from .ivf import ivf_knn
from .knn import brute_force_knn, lsh_knn

from pharmaforge_tpu.ops.geometry import (
    norm_no_nan,
    rbf,
    masked_mean,
    remove_masked_com,
)
from pharmaforge_tpu.ops.neighbors import (
    radius_mask,
    knn_mask,
    radius_neighbor_list,
    EdgeMasks,
    build_dynamic_edges,
    build_pp_neighbors,
)

"""Point-cloud op library (L2 in SURVEY.md).

Canonical implementations are pure jnp (XLA-compiled, run anywhere); hot ops have
fused Pallas TPU kernels in `pallas_kernels/` selected automatically on TPU via
the dispatch helpers here. All ops are batch-first, channel-last:
xyz [B, N, 3], features [B, N, C].
"""

from .core import square_distance, index_points
from .sampling import (
    farthest_point_sample,
    random_sample_indices,
    density_weighted_sample_indices,
)
from .grouping import (
    query_ball_point,
    knn,
    knn_set,
    knn_stat_weighted,
    sample_and_group,
    group_points,
    edge_conv_graph_feature,
)
from .interpolate import three_nn_interpolate
from .structure import eigh3x3, local_structure_features, estimate_normals
from .avs import (
    avs_net_sample_indices,
    avs_voxel_downsample,
    avs_adapt_voxel_size,
)

__all__ = [
    "square_distance",
    "index_points",
    "farthest_point_sample",
    "random_sample_indices",
    "density_weighted_sample_indices",
    "query_ball_point",
    "knn",
    "knn_set",
    "knn_stat_weighted",
    "sample_and_group",
    "group_points",
    "edge_conv_graph_feature",
    "three_nn_interpolate",
    "eigh3x3",
    "local_structure_features",
    "estimate_normals",
    "avs_net_sample_indices",
    "avs_voxel_downsample",
    "avs_adapt_voxel_size",
]

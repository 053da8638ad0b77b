"""Pure-JAX tensor ops (mirror of the reference's ``utils/ops.py``).

Everything here is a pure function of its inputs, shape-static, and safe to
call under ``jit`` / ``vmap`` / ``grad``.  Conventions:

  * point features are channels-last: ``(B, N, C)``;
  * kNN index tensors are ``(B, N, K)`` int32;
  * downsample index tensors are ``(B, M)`` int32.
"""

from samble_tpu.ops.neighbors import (
    index_points,
    knn,
    select_neighbors,
    select_neighbors_interpolate,
    group,
    neighbor_mask,
    gather_by_idx,
)
from samble_tpu.ops.attention import l2_global, norm_range, zscore
from samble_tpu.ops.bins import (
    compute_bin_boundaries_from_scores,
    update_bin_boundaries,
    bin_partition,
    bin_weights_calculation,
    calculate_num_points_to_choose,
)
from samble_tpu.ops.sampling import (
    sort_chunk,
    generate_downsampled_index,
    bin_idx_selection,
    bin2_idx_selection,
    farthest_point_sample,
    fps,
)

__all__ = [
    "index_points",
    "knn",
    "select_neighbors",
    "select_neighbors_interpolate",
    "group",
    "neighbor_mask",
    "gather_by_idx",
    "l2_global",
    "norm_range",
    "zscore",
    "compute_bin_boundaries_from_scores",
    "update_bin_boundaries",
    "bin_partition",
    "bin_weights_calculation",
    "calculate_num_points_to_choose",
    "sort_chunk",
    "generate_downsampled_index",
    "bin_idx_selection",
    "bin2_idx_selection",
    "farthest_point_sample",
    "fps",
]

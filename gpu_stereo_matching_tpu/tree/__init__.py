from gpu_stereo_matching_tpu.tree.builder import (  # noqa: F401
    SegmentTree,
    build_segment_tree,
    color_edge_weights,
    color_depth_edge_weights,
)
from gpu_stereo_matching_tpu.tree.filter import tree_filter  # noqa: F401

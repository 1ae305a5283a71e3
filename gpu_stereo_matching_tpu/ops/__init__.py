from gpu_stereo_matching_tpu.ops.color import (  # noqa: F401
    grayscale_u8,
    gray_rec601_bgr,
    gray_blockmatching_bgr,
    gradient_x,
    round_sat_u8,
)
from gpu_stereo_matching_tpu.ops.cost import (  # noqa: F401
    ad_cost_volume,
    color_gradient_cost_volume,
    right_cost_from_left,
)
from gpu_stereo_matching_tpu.ops.aggregate import (  # noqa: F401
    box_filter_sum,
    window_counts,
    aggregate_cost_volume,
)
from gpu_stereo_matching_tpu.ops.wta import wta_disparity  # noqa: F401
from gpu_stereo_matching_tpu.ops.postprocess import (  # noqa: F401
    lr_consistency_mask,
    median_filter_u8,
)
from gpu_stereo_matching_tpu.ops.remap import remap_bilinear_u8  # noqa: F401

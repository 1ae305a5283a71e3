from gpu_stereo_matching_tpu.models.block_matching import (  # noqa: F401
    block_matching_disparity,
    block_matching_pipeline,
)

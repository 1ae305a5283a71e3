from gpu_stereo_matching_tpu.core.config import (  # noqa: F401
    BlockMatchingConfig,
    SegmentTreeConfig,
    MeshConfig,
    CostConstants,
)

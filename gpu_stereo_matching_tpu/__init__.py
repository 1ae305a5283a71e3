"""gpu_stereo_matching_tpu — a TPU-native dense stereo depth engine.

A from-scratch JAX / XLA / Pallas / pjit framework with the capabilities of the
reference CUDA/C++ project ``ningw42/GPU_Stereo_Matching``:

* **Block matching pipeline** — grayscale conversion, calibration-based
  rectification (bilinear remap), per-disparity absolute-difference cost
  volume, SAD box-filter aggregation, winner-take-all disparity selection
  (reference: ``BlockMatching/Device.cu``).
* **Segment-tree pipeline** — color+gradient matching cost, non-local cost
  aggregation over a spanning tree of the 4-connected image graph built via
  Felzenszwalb–Huttenlocher segmentation, WTA, constant-time median
  post-filter, and an optional second iteration with left-right consistency
  and joint color+depth re-segmentation (reference: ``STMatching/``).

Design is TPU-first, not a port: cost volumes live in ``(D, H, W)`` /
``(B, D, H, W)`` layouts with W on the 128-lane axis, aggregation uses
prefix-sum box filters instead of per-pixel window loops, the hot path is a
fused Pallas kernel, the segment-tree filter is reformulated as parallel tree
scans, and scaling is expressed with ``jax.sharding.Mesh`` + ``shard_map``
halo exchange instead of CUDA grids.
"""

__version__ = "0.1.0"

from gpu_stereo_matching_tpu.core.config import (  # noqa: F401
    BlockMatchingConfig,
    SegmentTreeConfig,
    MeshConfig,
)

from gpu_stereo_matching_tpu.utils.profiling import StageTimer, FrameMetrics  # noqa: F401
from gpu_stereo_matching_tpu.utils.cache import ArtifactCache  # noqa: F401

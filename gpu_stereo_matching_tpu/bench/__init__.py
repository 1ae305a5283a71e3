from gpu_stereo_matching_tpu.bench.middlebury import (  # noqa: F401
    evaluate_scene,
    run_middlebury_suite,
)
from gpu_stereo_matching_tpu.bench.micro import run_micro_benchmarks  # noqa: F401
from gpu_stereo_matching_tpu.bench.scaling import run_scaling_benchmark  # noqa: F401
from gpu_stereo_matching_tpu.bench.streaming import run_streaming_benchmark  # noqa: F401

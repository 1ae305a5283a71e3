from gpu_stereo_matching_tpu.bench.middlebury import (  # noqa: F401
    evaluate_scene,
    run_middlebury_suite,
)

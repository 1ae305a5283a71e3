from gpu_stereo_matching_tpu.kernels.sad_wta import fused_block_matching  # noqa: F401

from gpu_stereo_matching_tpu.io.images import (  # noqa: F401
    load_image_bgr,
    load_image_gray,
    save_image,
)
from gpu_stereo_matching_tpu.io.calib_yaml import (  # noqa: F401
    StereoCalibration,
    load_opencv_stereo_yaml,
)
from gpu_stereo_matching_tpu.io.middlebury import (  # noqa: F401
    MiddleburyScene,
    load_middlebury_scene,
    list_middlebury_scenes,
)

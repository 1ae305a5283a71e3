from gpu_stereo_matching_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    virtual_cpu_mesh,
)
from gpu_stereo_matching_tpu.parallel.stereo import (  # noqa: F401
    make_sharded_block_matching,
)

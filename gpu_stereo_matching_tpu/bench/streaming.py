"""Calibrated-rig streaming throughput (BASELINE config 4).

End-to-end per frame: BGR → gray → bilinear remap through cached
rectification maps → fused Pallas block matching. Measured as a single
on-device dispatch over a frame batch (steady-state streaming).
"""

from __future__ import annotations

import json
import time

import numpy as np


def run_streaming_benchmark(
    calib_path: str = "/root/reference/Calib_Data_OpenCV.yml",
    height: int = 720,
    width: int = 1280,
    calib_size_hw=(800, 1280),
    num_frames: int = 16,
    num_disparities: int = 64,
    radius: int = 5,
    reps: int = 4,
) -> float:
    import jax

    from gpu_stereo_matching_tpu.core.config import BlockMatchingConfig
    from gpu_stereo_matching_tpu.models.streaming import rig_from_yaml

    rig = rig_from_yaml(
        calib_path,
        (height, width),
        BlockMatchingConfig(num_disparities=num_disparities, sad_radius=radius),
        scale_intrinsics_from=calib_size_hw,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    lb = jnp.asarray(
        rng.integers(0, 256, (num_frames, height, width, 3), dtype=np.uint8)
    )
    rb = jnp.asarray(
        rng.integers(0, 256, (num_frames, height, width, 3), dtype=np.uint8)
    )
    jax.block_until_ready((lb, rb))

    # Steady-state device throughput: frames already resident (as in a
    # double-buffered capture pipeline); `reps` in-graph repeats of the
    # batch keep the tunnel's ~23-40 ms per-dispatch round trip under 10%
    # of the measurement; completion is fenced by fetching a reduction of
    # the result — plain block_until_ready under-reports on async
    # backends (see CLAUDE.md benchmark discipline).
    @jax.jit
    def run_reps(lb, rb):
        # The left batch is XORed with the low bit of the previous rep's
        # checksum: a loop-carried data dependency, or XLA hoists the
        # loop-invariant batch out of the fori_loop and the bench measures
        # ONE batch divided by `reps` (observed: a bogus 828 fps).
        def rep(i, carry):
            acc, l = carry
            s = jnp.sum(rig._batch_step(l, rb, *rig._maps)[:, ::64, ::64])
            return acc + s, l ^ (s & 1).astype(l.dtype)

        acc, _ = jax.lax.fori_loop(
            0, reps, rep, (jnp.zeros((), jnp.int32), lb)
        )
        return acc

    def run():
        return int(run_reps(lb, rb))

    run()  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    fps = num_frames * reps / best
    print(
        json.dumps(
            {
                "metric": f"rig_streaming_{height}p_{num_disparities}disp_fps",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
            }
        )
    )
    return fps


if __name__ == "__main__":
    run_streaming_benchmark()

"""Headline benchmark: fused block matching, 1080p / 64 disparities.

Prints one JSON line: frames/sec/chip vs. the 60 fps north-star target
(BASELINE.md). Throughput is measured on-device by scanning a batch of
frames inside a single dispatch (amortizing host↔device/tunnel latency),
mirroring streaming video inference.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gpu_stereo_matching_tpu.utils.cache import enable_jit_cache

    enable_jit_cache()

    from gpu_stereo_matching_tpu.kernels.sad_wta import fused_block_matching

    rng = np.random.default_rng(0)
    # 32-frame on-device scan, repeated 4× inside ONE dispatch (~2 s of
    # 60 fps video per dispatch). The tunnel's per-dispatch round trip is
    # ~23 ms with bad-day spikes — at 32 frames/dispatch that variance
    # moved the official number 448→389 fps between rounds 1 and 2; at
    # 128 frame-equivalents it is <10% of the measurement. Best-of-5.
    b, reps, h, w, d, r = 32, 4, 1080, 1920, 64, 5
    left = jnp.asarray(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
    right = jnp.asarray(rng.integers(0, 256, (b, h, w), dtype=np.uint8))

    @jax.jit
    def batch_run(left, right):
        def step(acc, lr):
            l, rr = lr
            out = fused_block_matching(l, rr, d, r)
            return acc + jnp.sum(out), None

        # Loop-carried data dependency (XOR the batch with the previous
        # repeat's checksum bit) so XLA cannot hoist the loop-invariant
        # scan out of the fori_loop and under-measure.
        def rep(i, carry):
            acc, lft = carry
            a, _ = jax.lax.scan(step, acc, (lft, right))
            return a, lft ^ (a & 1).astype(lft.dtype)

        acc, _ = jax.lax.fori_loop(
            0, reps, rep, (jnp.zeros((), jnp.int32), left)
        )
        return acc

    int(batch_run(left, right))  # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        int(batch_run(left, right))
        best = min(best, time.perf_counter() - t0)
    fps = b * reps / best

    baseline_fps = 60.0  # north-star target (the reference publishes none)
    print(
        json.dumps(
            {
                "metric": "block_matching_1080p_64disp_fps_per_chip",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline_fps, 2),
            }
        )
    )
    return fps


if __name__ == "__main__":
    main()

"""Round-5 A/B: banded-MXU vertical window sum vs the pure-VPU fused
kernel (VERDICT r4 weak #3 / next-round task 2).

The fused packed-pair SAD+WTA kernel is VPU-bound at ~35% of peak with the
MXU idle by design; the roofline's named lever is reformulating the
(2r+1)-row window sums as matmuls against banded 0/1 matrices. The
``mxu=True`` kernel variant (``kernels/sad_wta.py:_packed_pair_body_mxu``)
moves the VERTICAL sum onto the MXU (two bf16 matmuls per disparity pair,
f32 accumulation — exact) while the horizontal sum keeps the packed VPU
path. Both variants are bit-identical (gated in interpret mode and here on
hardware).

Measurement mirrors bench.py: a 32-frame on-device scan repeated 4× inside
one dispatch with a loop-carried dependency, best of 5, scalar-fenced.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_mxu_sad.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(b: int = 32, reps: int = 4, h: int = 1080, w: int = 1920,
         d: int = 64, r: int = 5):
    import jax
    import jax.numpy as jnp

    from gpu_stereo_matching_tpu.kernels.sad_wta import fused_block_matching
    from gpu_stereo_matching_tpu.utils.cache import enable_jit_cache

    enable_jit_cache()
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
    right = jnp.asarray(rng.integers(0, 256, (b, h, w), dtype=np.uint8))

    def make_run(mxu):
        @jax.jit
        def batch_run(left, right):
            def step(acc, lr):
                l, rr = lr
                out = fused_block_matching(l, rr, d, r, mxu=mxu)
                return acc + jnp.sum(out), None

            def rep(i, carry):
                acc, lft = carry
                a, _ = jax.lax.scan(step, acc, (lft, right))
                return a, lft ^ (a & 1).astype(lft.dtype)

            acc, _ = jax.lax.fori_loop(
                0, reps, rep, (jnp.zeros((), jnp.int32), left)
            )
            return acc

        return batch_run

    out = {"shape": f"{h}x{w}x{d}d_r{r}", "frames_per_dispatch": b * reps}
    sums = {}
    for name, mxu in (("vpu", False), ("mxu", True)):
        run = make_run(mxu)
        sums[name] = int(run(left, right))  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            int(run(left, right))
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_fps_per_chip"] = round(b * reps / best, 1)
        out[f"{name}_ms_per_frame"] = round(best / (b * reps) * 1e3, 3)
    # Same checksum => same disparities on hardware too (scan-summed).
    out["checksums_equal"] = bool(sums["vpu"] == sums["mxu"])
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

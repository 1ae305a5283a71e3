"""True ST device rates with the tunnel round trip cancelled (round 5).

Every fenced group measurement includes one ~25-30 ms dispatch round
trip (~3-4 ms/frame at 8-frame groups) that is NOT device time. Since
dispatches queue asynchronously, timing one fenced dispatch (t1) and two
back-to-back dispatches with a single fence (t2) gives the pure device
time of one group as t2 − t1 — no recompiles needed (the second dispatch
reuses the cached executable; a data dependency chains them so XLA
cannot elide the first).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_st_true_rate.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(group_size: int = 8, reps: int = 5):
    import jax
    import jax.numpy as jnp

    from gpu_stereo_matching_tpu.core.config import SegmentTreeConfig
    from gpu_stereo_matching_tpu.io.middlebury import load_middlebury_scene
    from gpu_stereo_matching_tpu.models.segment_tree import (
        _st1_device_group_jit,
        _st2_phase1_group_jit,
    )
    from gpu_stereo_matching_tpu.models.segment_tree_stream import (
        SegmentTreeBatchPipeline,
        SegmentTreeST2BatchPipeline,
    )
    from gpu_stereo_matching_tpu.utils.cache import enable_jit_cache

    def fence(x):
        return int(np.asarray(jnp.sum(x.astype(jnp.int32))))

    enable_jit_cache()
    cfg = SegmentTreeConfig()
    scene = load_middlebury_scene("/root/reference/Images", "Art")
    rng = np.random.default_rng(0)

    def jitter(img):
        noise = rng.integers(-6, 7, img.shape, dtype=np.int16)
        return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)

    frames = [
        (jitter(scene.left_bgr), jitter(scene.right_bgr))
        for _ in range(group_size)
    ]
    out = {"shape": "463x370x60", "group": group_size}

    from concurrent.futures import ThreadPoolExecutor

    pipe1 = SegmentTreeBatchPipeline(cfg, group_size=group_size, workers=2)
    with ThreadPoolExecutor(max_workers=2) as pool:
        lefts, rights, plans, _n = pipe1._host_build_group(frames, pool)
    jl, jr = jax.device_put(lefts), jax.device_put(rights)
    p = plans.to_device()

    def st1_once():
        return _st1_device_group_jit(jl, jr, p, cfg.max_disp_levels)

    def timed(fn):
        fence(fn())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    # One fenced dispatch vs two chained dispatches, one fence. The
    # second consumes the first's output (XOR into the input's low bit)
    # so it cannot be elided or reordered.
    def st1_twice():
        a = st1_once()
        jl2 = jl ^ (a[:, :1, :1] & 1).astype(jl.dtype)[..., None]
        return _st1_device_group_jit(jl2, jr, p, cfg.max_disp_levels)

    t1 = timed(st1_once)
    t2 = timed(st1_twice)
    out["st1_fenced_ms_per_frame"] = round(t1 / group_size * 1e3, 2)
    out["st1_true_device_ms_per_frame"] = round(
        (t2 - t1) / group_size * 1e3, 2
    )
    out["st1_true_device_fps_per_chip"] = round(group_size / (t2 - t1), 1)
    out["round_trip_ms"] = round((2 * t1 - t2) * 1e3, 1)

    # ST-2: phase 1 + phase 2 per group.
    pipe2 = SegmentTreeST2BatchPipeline(
        cfg, group_size=group_size, workers=2, lean=True
    )
    with ThreadPoolExecutor(max_workers=2) as pool:
        l2, r2, plans1, _ = pipe2._sigma1_group(frames, pool)
        jl2a, jr2a = jax.device_put(l2), jax.device_put(r2)
        p1 = plans1.to_device()
        from gpu_stereo_matching_tpu.models.segment_tree import (
            _unpack_phase1,
        )

        packed = _st2_phase1_group_jit(
            jl2a, jr2a, p1, cfg.max_disp_levels, cfg.lr_max_diff
        )
        d_b, m_b = _unpack_phase1(packed)
        p2 = pipe2._final_plans(l2, d_b, m_b, pool).to_device()

    def st2_once():
        d = _st2_phase1_group_jit(
            jl2a, jr2a, p1, cfg.max_disp_levels, cfg.lr_max_diff
        )
        jlx = jl2a ^ (d[:, :1, :1] & 1)[..., None]
        return _st1_device_group_jit(jlx, jr2a, p2, cfg.max_disp_levels)

    def st2_twice():
        a = st2_once()
        jlx = jl2a ^ (a[:, :1, :1] & 1).astype(jl2a.dtype)[..., None]
        d = _st2_phase1_group_jit(
            jlx, jr2a, p1, cfg.max_disp_levels, cfg.lr_max_diff
        )
        jly = jlx ^ (d[:, :1, :1] & 1)[..., None]
        return _st1_device_group_jit(jly, jr2a, p2, cfg.max_disp_levels)

    t1 = timed(st2_once)
    t2 = timed(st2_twice)
    out["st2_fenced_ms_per_frame"] = round(t1 / group_size * 1e3, 2)
    out["st2_true_device_ms_per_frame"] = round(
        (t2 - t1) / group_size * 1e3, 2
    )
    out["st2_true_device_fps_per_chip"] = round(group_size / (t2 - t1), 1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

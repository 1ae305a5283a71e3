"""Round-5 experiment: in-graph inv_perm vs shipping it (VERDICT task 5).

The lean StridePlan drops the inv_perm(N) section (0.51 MB/frame packed at
Middlebury size) and recomputes it on device from the decoded perm. This
tool A/Bs, on the real chip and the production 8-frame group dispatch:

  legacy          round-4 format (inv shipped, verbatim (2,total) codes)
  lean+argsort    inv = argsort(perm)[:N] (one stable sort of ~1.76N i32)
  lean+scatter    inv = zeros(N).at[perm].set(iota, mode='drop')

plus micro-timings of the two inversion primitives alone. Output: one JSON
line; device ms/frame per variant decides tree/stride._INV_METHOD's
default.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_inv_perm.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def _fence(x):
    import jax.numpy as jnp

    return int(np.asarray(jnp.sum(x.astype(jnp.int32))))


def main(group_size: int = 8, reps: int = 3):
    import jax
    import jax.numpy as jnp

    import gpu_stereo_matching_tpu.tree.stride as stride_mod
    from gpu_stereo_matching_tpu.core.config import SegmentTreeConfig
    from gpu_stereo_matching_tpu.io.middlebury import load_middlebury_scene
    from gpu_stereo_matching_tpu.models.segment_tree import _st1_device_group
    from gpu_stereo_matching_tpu.tree.stride import stack_stride_plans
    from gpu_stereo_matching_tpu.utils.cache import enable_jit_cache

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
    jl = jax.device_put(np.stack([f[0] for f in frames]))
    jr = jax.device_put(np.stack([f[1] for f in frames]))
    _fence(jl[0, :1, :1])

    from gpu_stereo_matching_tpu.tree.builder import (
        build_segment_tree,
        color_edge_weights,
    )

    def plans_for(lean):
        ps = []
        for f in frames:
            h, w = f[0].shape[:2]
            tree = build_segment_tree(
                color_edge_weights(f[0]), h, w,
                tau=cfg.tau, min_size=cfg.min_size_seg,
                penalty=cfg.penalty_cross_seg, weight_scale=1.0,
            )
            ps.append(
                stride_mod.StridePlan.from_tree(
                    tree, cfg.sigma, device=False, lean=lean
                )
            )
        for _ in range(8):
            if len({p.layout_key for p in ps}) == 1:
                break
            ps = [
                stride_mod.StridePlan.from_tree(
                    build_segment_tree(
                        color_edge_weights(f[0]), *f[0].shape[:2],
                        tau=cfg.tau, min_size=cfg.min_size_seg,
                        penalty=cfg.penalty_cross_seg, weight_scale=1.0,
                    ),
                    cfg.sigma, device=False, lean=lean,
                )
                for f in frames
            ]
        return stack_stride_plans(ps)

    out = {"shape": "463x370x60", "group": group_size}
    results = {}
    for name, lean, method in (
        ("legacy", False, "argsort"),
        ("lean_argsort", True, "argsort"),
        ("lean_scatter", True, "scatter"),
    ):
        stride_mod._INV_METHOD = method
        stacked = plans_for(lean)
        out[f"{name}_plan_mb_per_frame"] = round(
            stacked.transport_nbytes / group_size / 1e6, 3
        )
        p = stacked.to_device()
        _fence(p.ints[0, :1])
        step = jax.jit(_st1_device_group, static_argnums=(3,))
        res = step(jl, jr, p, cfg.max_disp_levels)
        _fence(res)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            res = step(jl, jr, p, cfg.max_disp_levels)
            _fence(res)
            best = min(best, time.perf_counter() - t0)
        results[name] = best
        out[f"{name}_device_ms_per_frame"] = round(
            best / group_size * 1e3, 2
        )

    # Micro: the two inversion primitives on a representative perm.
    stacked = plans_for(True)
    total, n = stacked.total_pos, stacked.num_nodes
    perm_host = np.full(total, n, np.int32)
    perm_host[: n] = np.random.default_rng(1).permutation(n).astype(np.int32)
    perm = jax.device_put(perm_host)

    def run_micro(fn):
        f = jax.jit(fn)
        _fence(f(perm))
        best = float("inf")
        for _ in range(reps + 2):
            t0 = time.perf_counter()
            _fence(f(perm))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    out["micro_argsort_ms"] = round(
        run_micro(lambda p_: jnp.argsort(p_)[:n]), 2
    )
    out["micro_scatter_ms"] = round(
        run_micro(
            lambda p_: jnp.zeros((n,), jnp.int32)
            .at[p_]
            .set(jnp.arange(total, dtype=jnp.int32), mode="drop")
        ),
        2,
    )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

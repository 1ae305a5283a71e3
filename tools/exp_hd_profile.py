"""Round-5: which stage makes the HD (720p) ST filter super-linear?

Art (total_pos 301k) filters in ~12-15 ms/frame; HD (total_pos 1.48M,
4.9×) measures ~108 ms/frame (~1.8× super-linear), and per-band trees
recover only ~12% — so the round-4 hypothesis (serial light-depth round
latency) is wrong: banding cuts rounds per tree but barely moves the
total. This tool times nested prefixes of the single-frame HD program,
each jitted separately and scalar-fenced (differences isolate stages;
every stage pays the same ~25 ms tunnel round trip, which cancels):

  cost       color+gradient cost volume only
  filter     cost → stride filter (N,D)
  wta        cost → filter → WTA (H,W)
  full       cost → filter → WTA → 7×7 median

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_hd_profile.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(reps: int = 3):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gpu_stereo_matching_tpu.core.config import SegmentTreeConfig
    from gpu_stereo_matching_tpu.io.middlebury import load_middlebury_scene
    from gpu_stereo_matching_tpu.models.segment_tree import _to_nodes
    from gpu_stereo_matching_tpu.ops.cost import color_gradient_cost_volume
    from gpu_stereo_matching_tpu.ops.postprocess import median_filter_u8
    from gpu_stereo_matching_tpu.ops.wta import wta_disparity
    from gpu_stereo_matching_tpu.tree.builder import (
        build_segment_tree,
        color_edge_weights,
    )
    from gpu_stereo_matching_tpu.tree.stride import (
        StridePlan,
        tree_filter_nodes_sb,
    )
    from gpu_stereo_matching_tpu.utils.cache import enable_jit_cache

    def fence(x):
        return int(np.asarray(jnp.sum(x.astype(jnp.int32))))

    enable_jit_cache()
    cfg = SegmentTreeConfig()
    scene = load_middlebury_scene("/root/reference/Images", "Art")

    def up(img):
        return np.asarray(
            Image.fromarray(img).resize((1280, 720), Image.BILINEAR)
        )

    left, right = up(scene.left_bgr), up(scene.right_bgr)
    h, w = left.shape[:2]
    plan = StridePlan.from_tree(
        build_segment_tree(color_edge_weights(left), h, w), cfg.sigma
    )
    jl, jr = jax.device_put(left), jax.device_put(right)
    fence(jl[:1, :1])

    d = cfg.max_disp_levels

    def prog_cost(l, r, p):
        return color_gradient_cost_volume(l, r, d)

    def prog_filter(l, r, p):
        return tree_filter_nodes_sb(
            _to_nodes(color_gradient_cost_volume(l, r, d)), p
        )

    def prog_wta(l, r, p):
        f = tree_filter_nodes_sb(
            _to_nodes(color_gradient_cost_volume(l, r, d)), p
        )
        return wta_disparity(f, axis=1).reshape(h, w)

    def prog_full(l, r, p):
        disp = prog_wta(l, r, p)
        return median_filter_u8(disp.astype(jnp.uint8), 3)

    out = {"shape": f"{h}x{w}x{d}d", "total_pos": plan.total_pos}
    prev = 0.0
    for name, fn in (("cost", prog_cost), ("filter", prog_filter),
                     ("wta", prog_wta), ("full", prog_full)):
        jf = jax.jit(fn)
        fence(jf(jl, jr, plan))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(jf(jl, jr, plan))
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_ms"] = round(best * 1e3, 1)
        out[f"{name}_delta_ms"] = round((best - prev) * 1e3, 1)
        prev = best
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

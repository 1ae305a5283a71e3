"""Round-5 diagnosis: which lean-path ingredient regresses the HD filter?

st_hd measured 95 ms/frame (round 4: legacy plans, plain f32 gathers) →
237 ms/frame (round 5: lean plans + scatter inversion + u16-view
gathers). At Art size the same ingredients measured FASTER. This tool
isolates the factor at HD by running the SAME 2-frame 720p global-tree
group under each config in a fresh subprocess (the knobs are read at
import):

  legacy_fast      lean=0  fastgather=1
  legacy_nofast    lean=0  fastgather=0   (the round-4 baseline)
  lean_scatter     lean=1  fastgather=1   inv=scatter (round-5 default)
  lean_argsort     lean=1  fastgather=1   inv=argsort
  lean_sc_nofast   lean=1  fastgather=0   inv=scatter

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_hd_ab.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

CONFIGS = [
    ("legacy_fast", {"GSM_SB_FASTGATHER": "1"}, False),
    ("legacy_nofast", {"GSM_SB_FASTGATHER": "0"}, False),
    ("lean_scatter", {"GSM_SB_FASTGATHER": "1", "GSM_SB_INV": "scatter"},
     True),
    ("lean_argsort", {"GSM_SB_FASTGATHER": "1", "GSM_SB_INV": "argsort"},
     True),
    ("lean_sc_nofast", {"GSM_SB_FASTGATHER": "0", "GSM_SB_INV": "scatter"},
     True),
    ("legacy_barrier", {"GSM_SB_FASTGATHER": "barrier"}, False),
]


def child(lean: bool, group_size: int = 2, reps: int = 3):
    import jax
    from PIL import Image

    from gpu_stereo_matching_tpu.core.config import SegmentTreeConfig
    from gpu_stereo_matching_tpu.io.middlebury import load_middlebury_scene
    from gpu_stereo_matching_tpu.models.segment_tree import (
        _st1_device_group_jit,
    )
    from gpu_stereo_matching_tpu.tree.builder import (
        build_segment_tree,
        color_edge_weights,
    )
    from gpu_stereo_matching_tpu.tree.stride import (
        StridePlan,
        stack_stride_plans,
    )
    from gpu_stereo_matching_tpu.utils.cache import enable_jit_cache

    def fence(x):
        import jax.numpy as jnp

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
    rng = np.random.default_rng(0)

    def jitter(img):
        noise = rng.integers(-6, 7, img.shape, dtype=np.int16)
        return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)

    frames = [(jitter(left), jitter(right)) for _ in range(group_size)]

    def build(f):
        return StridePlan.from_tree(
            build_segment_tree(color_edge_weights(f[0]), h, w),
            cfg.sigma, device=False, lean=lean,
        )

    plans = [build(f) for f in frames]
    for _ in range(8):
        if len({p.layout_key for p in plans}) == 1:
            break
        plans = [build(f) for f in frames]
    stacked = stack_stride_plans(plans).to_device()
    jl = jax.device_put(np.stack([f[0] for f in frames]))
    jr = jax.device_put(np.stack([f[1] for f in frames]))
    fence(jl[0, :1, :1])
    res = _st1_device_group_jit(jl, jr, stacked, cfg.max_disp_levels)
    fence(res)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        res = _st1_device_group_jit(jl, jr, stacked, cfg.max_disp_levels)
        fence(res)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "child_ms_per_frame": round(best / group_size * 1e3, 2),
        "checksum": fence(res),
    }))


def main():
    out = {}
    for name, env, lean in CONFIGS:
        e = dict(os.environ)
        e.update(env)
        e["PYTHONPATH"] = "/root/repo:/root/.axon_site"
        r = subprocess.run(
            [sys.executable, __file__, "--child", "1" if lean else "0"],
            env=e, capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            out[name] = {"error": r.stderr[-500:]}
        else:
            out[name] = json.loads(line[-1])
        print(json.dumps({name: out[name]}), flush=True)
    checks = {
        v["checksum"] for v in out.values() if isinstance(v, dict)
        and "checksum" in v
    }
    print(json.dumps({"all_checksums_equal": len(checks) == 1}))
    return out


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(lean=sys.argv[sys.argv.index("--child") + 1] == "1")
    else:
        main()

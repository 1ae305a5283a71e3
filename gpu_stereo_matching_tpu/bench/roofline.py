"""Roofline accounting for the hot kernels (north-star "speed of light").

For each hot kernel this module counts the work analytically from the
kernel's own structure (itemized below — estimates carry the itemization,
not a hand-wave) and compares against TPU v5e peaks:

* HBM bandwidth: 8.1e11 B/s (v5e, public spec).
* VPU integer/f32 throughput: 8 sublanes × 128 lanes × 4 ALUs × 0.94 GHz
  ≈ 3.85e12 elementwise ops/s (the scaling-book VPU model; the MXU is
  irrelevant here — none of these kernels contract).

Kernels covered:

1. **Fused packed-pair SAD+WTA** (`kernels/sad_wta.py`): per pixel per
   disparity *pair*, on the lane-padded slab: rotate(1) + diffs/pack(6) +
   vertical sliding sum(5, on the (tile+2r)-row halo ≈ 1.1×) + masks(6) +
   horizontal sliding sum(5) + unpack/keys/WTA(8) ≈ 29 int32 VPU ops
   (±15%: selects and the halo factor depend on tile shape). HBM: two u8
   slabs in (halo re-read per tile), one u8 row out.
2. **Offset-sweep remap** (`kernels/remap.py`): per plan step, the kernel
   touches every tile pixel once (roll + bounds select + accumulate ≈ 4
   ops); steps come from the actual plan, so the count is exact per rig.
3. **Stride-bucket ST filter** (`tree/stride.py`): dominated by XLA row
   gathers — modeled from the *measured* ~17 ns/row (in-graph gather of
   64-f32 rows, bench/micro round-3 measurement) against the 0.30 ns a
   240 B row would cost at HBM peak; plus 2 affine-scan passes
   (≈ 6 ops/element/step) over the bucketed layout.

Run: ``python -m gpu_stereo_matching_tpu.bench.roofline`` (analytic, uses
recorded timings) or ``--live`` to re-measure the fused kernel on the
current backend first.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

V5E_HBM_BPS = 8.1e11
V5E_VPU_OPS = 8 * 128 * 4 * 0.94e9  # ≈ 3.85e12 elementwise ops/s
GATHER_NS_PER_ROW = 17.0  # measured: in-graph XLA gather, 64-f32 rows


def fused_sad_roofline(
    height: int, width: int, num_disp: int, radius: int, measured_ms: float
) -> dict:
    k = 2 * radius + 1
    wp = int(np.ceil(width / 128)) * 128
    tile_h = 8 * max(1, 256 // (wp // 128))  # matches kernel's tile choice
    halo = (tile_h + 2 * radius) / tile_h
    pairs = num_disp // 2
    ops_per_px_pair = (
        1  # lane rotate of the shifted right slab
        + 6 * halo  # two abs-diffs + 16-bit pack, on halo rows
        + 5 * halo  # vertical sliding sum (doubling, k=11 -> 5 adds)
        + 6  # column validity / width masks (compare+select)
        + 5  # horizontal sliding sum
        + 8  # unpack, key pack, running min x2
    )
    total_ops = height * wp * pairs * ops_per_px_pair
    # HBM: both u8 slabs re-read with halo, one u8 disparity row out.
    total_bytes = 2 * height * wp * halo + height * wp
    t = measured_ms * 1e-3
    return {
        "kernel": "fused_sad_wta_packed_pair",
        "shape": f"{height}x{width}x{num_disp}d_r{radius}",
        "measured_ms": measured_ms,
        "vpu_ops": int(total_ops),
        "hbm_bytes": int(total_bytes),
        "vpu_util_pct": round(100 * total_ops / t / V5E_VPU_OPS, 1),
        "hbm_util_pct": round(100 * total_bytes / t / V5E_HBM_BPS, 2),
        "bound": "VPU",
        "vpu_bound_ms": round(total_ops / V5E_VPU_OPS * 1e3, 3),
        "hbm_bound_ms": round(total_bytes / V5E_HBM_BPS * 1e3, 4),
    }


def remap_roofline(
    height: int, width: int, plan_steps: int, measured_ms: float
) -> dict:
    wp = int(np.ceil(width / 128)) * 128
    ops = height * wp * plan_steps * 4.0  # roll + bounds select + accumulate
    byts = 2 * height * wp  # u8 in + u8 out (maps folded into the plan)
    t = measured_ms * 1e-3
    return {
        "kernel": "remap_offset_sweep",
        "shape": f"{height}x{width}_{plan_steps}steps",
        "measured_ms": measured_ms,
        "vpu_ops": int(ops),
        "hbm_bytes": int(byts),
        "vpu_util_pct": round(100 * ops / t / V5E_VPU_OPS, 1),
        "hbm_util_pct": round(100 * byts / t / V5E_HBM_BPS, 2),
        "bound": "VPU (plan-step sweep)",
        "vpu_bound_ms": round(ops / V5E_VPU_OPS * 1e3, 3),
    }


def st_filter_roofline(plan, num_disp: int, measured_ms: float) -> dict:
    """Gather-rows + scan-ops model for the stride-bucket filter."""
    total = plan.total_pos
    n = plan.num_nodes
    hp = [sum(p for _e, p in row) for row in plan.buckets]
    live = plan.n_real if plan.n_real >= 0 else len(plan.buckets)
    gather_rows = (
        total          # perm in (cost -> plan order)
        + total        # per-round light pulls (destination-sized)
        + 2 * sum(hp[:live])  # head_perm reorders + down-pass parent pulls
        + n            # inv_perm out
    )
    scan_elems = sum(
        (1 << e) * p * e for row in plan.buckets[:live] for e, p in row
    )
    scan_ops = 2 * scan_elems * num_disp * 6  # up+down, a/b update FMAs
    row_bytes = num_disp * 4
    t = measured_ms * 1e-3
    gather_t = gather_rows * GATHER_NS_PER_ROW * 1e-9
    hbm_min_t = gather_rows * row_bytes / V5E_HBM_BPS
    return {
        "kernel": "st_stride_filter",
        "shape": f"N={n}_total={total}_D={num_disp}",
        "measured_ms": measured_ms,
        "gather_rows": int(gather_rows),
        "gather_model_ms": round(gather_t * 1e3, 2),
        "gather_hbm_floor_ms": round(hbm_min_t * 1e3, 3),
        "gather_efficiency_vs_hbm_pct": round(100 * hbm_min_t / gather_t, 1),
        "scan_vpu_ops": int(scan_ops),
        "scan_vpu_ms": round(scan_ops / V5E_VPU_OPS * 1e3, 3),
        "bound": "gather overhead (XLA row-gather ~17 ns/row = ~2% of the "
                 "HBM roofline; the lever is fewer rows, not bandwidth)",
        "model_total_ms": round(
            (gather_t + scan_ops / V5E_VPU_OPS) * 1e3, 2
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--live", action="store_true",
                    help="re-measure the fused kernel on this backend")
    ap.add_argument("--sad-1080p-ms", type=float, default=1.58,
                    help="measured fused-kernel ms/frame at 1080p/64d")
    ap.add_argument("--sad-4k-ms", type=float, default=6.6)
    ap.add_argument("--remap-ms", type=float, default=1.9,
                    help="per-tile sweep remap ms/frame at 720p")
    ap.add_argument("--remap-steps", type=int, default=300,
                    help="mean plan steps per tile (per-tile sweep)")
    ap.add_argument("--st-ms", type=float, default=12.8,
                    help="stride filter pipeline ms/frame (Art, 60d)")
    args = ap.parse_args()

    if args.live:
        # bench.py prints the headline fps; 1000/fps is the ms/frame.
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "gsm_bench_headline",
            os.path.join(os.path.dirname(__file__), "../../bench.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        args.sad_1080p_ms = 1000.0 / mod.main()

    out = [
        fused_sad_roofline(1080, 1920, 64, 5, args.sad_1080p_ms),
        fused_sad_roofline(2160, 3840, 64, 5, args.sad_4k_ms),
        remap_roofline(720, 1280, args.remap_steps, args.remap_ms),
    ]
    # ST filter: build the Art plan for the true layout.
    try:
        from gpu_stereo_matching_tpu.io.middlebury import (
            load_middlebury_scene,
        )
        from gpu_stereo_matching_tpu.tree.builder import (
            build_segment_tree,
            color_edge_weights,
        )
        from gpu_stereo_matching_tpu.tree.stride import StridePlan

        sc = load_middlebury_scene("/root/reference/Images", "Art")
        h, w = sc.left_bgr.shape[:2]
        tree = build_segment_tree(color_edge_weights(sc.left_bgr), h, w)
        plan = StridePlan.from_tree(tree, 0.1, device=False)
        out.append(st_filter_roofline(plan, 60, args.st_ms))
    except Exception as e:  # dataset not present
        out.append({"kernel": "st_stride_filter", "skipped": str(e)})

    for row in out:
        print(json.dumps(row))
    return out


if __name__ == "__main__":
    main()

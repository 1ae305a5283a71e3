"""Bench harness smoke tests (CPU): imports, tiny runs, metric math."""

import numpy as np

from gpu_stereo_matching_tpu.bench.micro import run_micro_benchmarks
from gpu_stereo_matching_tpu.bench.scaling import run_scaling_benchmark
from gpu_stereo_matching_tpu.core.config import BlockMatchingConfig, MeshConfig
from gpu_stereo_matching_tpu.io.middlebury import bad_pixel_rate, nonocc_mask


def test_micro_benchmarks_tiny():
    res = run_micro_benchmarks(height=16, width=32, iters=2)
    assert set(res) >= {"gray_tpu", "remap_tpu", "median7x7_tpu"}
    assert all(v > 0 for v in res.values())


def test_scaling_benchmark_tiny():
    pts = run_scaling_benchmark(
        MeshConfig(data=2),
        BlockMatchingConfig(num_disparities=4, sad_radius=1),
        num_frames=2, height=16, width=24,
    )
    assert len(pts) == 2
    assert pts[0].devices == 1 and pts[1].devices == 2
    assert pts[1].efficiency is not None


def test_bad_pixel_rate_math():
    gt = np.array([[30, 0], [60, 90]], np.uint8)  # true disp 10, -, 20, 30
    disp = np.array([[10, 5], [25, 30]], np.float64)
    # errors: 0, (ignored), 5, 0 → 1 of 3 valid pixels bad at delta 2
    assert bad_pixel_rate(disp, gt, delta=2.0) == 1 / 3


def test_nonocc_mask_math():
    gt_l = np.zeros((1, 6), np.uint8)
    gt_r = np.zeros((1, 6), np.uint8)
    gt_l[0, 4] = 6  # disp 2 → matches right pixel x=2
    gt_r[0, 2] = 6
    gt_l[0, 5] = 12  # disp 4 → right pixel x=1 is unknown (0) → |4-0|>1 → occluded
    mask = nonocc_mask(gt_l, gt_r)
    assert bool(mask[0, 4]) is True
    assert bool(mask[0, 5]) is False


def test_scaling_prediction_model():
    """Round-5 comm-volume arithmetic: prescribed config-5 strategies meet
    the >=85% bar; the disp-axis WTA all-reduce is correctly flagged as
    comm-bound at full 1080p (the reason it is a memory lever only)."""
    from gpu_stereo_matching_tpu.bench.scaling import (
        predict_scaling_efficiency,
    )

    rows = predict_scaling_efficiency()
    by = {r["strategy"]: r for r in rows}
    for name, r in by.items():
        assert 0.0 < r["predicted_efficiency"] <= 1.0
        if "not prescribed" not in name:
            assert r["meets_85pct"], name
    # Halo bytes: 2 images x 2 directions x 5 rows x 1920 u8.
    assert by["space_bm"]["comm_bytes_per_frame"] == 2 * 2 * 5 * 1920
    # The full-H disp all-reduce must be honestly comm-bound.
    disp = next(r for r in rows if r["strategy"].startswith("disp_wta"))
    assert not disp["meets_85pct"]

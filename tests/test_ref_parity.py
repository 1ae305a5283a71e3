"""Parity against the REAL reference executable (compiled via the shim).

Builds ``/root/reference/STMatching`` with ``tools/refshim`` (a minimal
cv::Mat + PGM/PPM I/O shim — no OpenCV) and diffs this repo's ST-1 output
against the reference binary's on a quarter scene. The full 6-scene sweep
lives in ``tools/ref_parity.py``; this test keeps the loop closed in CI.
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, os.path.abspath(TOOLS))


@pytest.mark.slow
def test_st1_matches_reference_binary_on_art():
    import ref_parity

    from gpu_stereo_matching_tpu.core.config import SegmentTreeConfig
    from gpu_stereo_matching_tpu.io.middlebury import load_middlebury_scene
    from gpu_stereo_matching_tpu.models.segment_tree import st1_disparity

    build_dir = os.path.join(tempfile.gettempdir(), "gsm_refbuild_test")
    os.makedirs(build_dir, exist_ok=True)
    try:
        exe = ref_parity.build_ref_binary(build_dir)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build reference binary here: {e}")

    root = "/root/reference/Images"
    sc = load_middlebury_scene(root, "Art")
    cfg = SegmentTreeConfig()
    ref = ref_parity.run_reference(
        exe,
        os.path.join(root, "Art", "view1.png"),
        os.path.join(root, "Art", "view5.png"),
        method=0, workdir=build_dir,
    )
    ours = st1_disparity(sc.left_bgr, sc.right_bgr, cfg)
    assert ref.shape == ours.shape
    diff = np.abs(
        ref.astype(np.float64) - ours.astype(np.float64)
    ) / cfg.disparity_scale
    bad2 = (diff > 2.0).mean() * 100
    # North star: within 2% bad-2.0 of the reference disparities.
    assert bad2 <= 2.0, f"bad2 vs reference output = {bad2:.2f}%"
    # And the agreement should be near-bitwise, not just within budget.
    assert (ref == ours).mean() > 0.97


@pytest.mark.slow
def test_bm_matches_reference_cpu_matcher():
    """Interior disparities bit-match the reference's own CPU matcher;
    every interior mismatch is its documented dm=-256 threshold quirk."""
    import ref_parity_bm

    try:
        out = ref_parity_bm.run_parity()
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build reference BM binary here: {e}")
    assert out["unexplained"] == 0
    assert out["interior_exact_pct"] > 99.5


@pytest.mark.slow
def test_st1_128disp_matches_reference_binary_on_art():
    """Round-5 gate: the config-3 128-disparity stride path vs the
    reference binary at maxDispLevel=128 (a reference CLI argument,
    main.cpp:49-67). Full-sweep tool: tools/ref_parity.py --max-level 128
    (measured Art: st1 0.42% / st2 0.14% bad-2.0, ~99.2/99.6% bit-exact)."""
    import dataclasses

    import ref_parity

    from gpu_stereo_matching_tpu.core.config import SegmentTreeConfig
    from gpu_stereo_matching_tpu.io.middlebury import load_middlebury_scene
    from gpu_stereo_matching_tpu.models.segment_tree import st1_disparity

    build_dir = os.path.join(tempfile.gettempdir(), "gsm_refbuild_test")
    os.makedirs(build_dir, exist_ok=True)
    try:
        exe = ref_parity.build_ref_binary(build_dir)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build reference binary here: {e}")

    root = "/root/reference/Images"
    sc = load_middlebury_scene(root, "Art")
    cfg = dataclasses.replace(SegmentTreeConfig(), max_disp_levels=128)
    ref = ref_parity.run_reference(
        exe,
        os.path.join(root, "Art", "view1.png"),
        os.path.join(root, "Art", "view5.png"),
        method=0, workdir=build_dir, max_level=128,
    )
    ours = st1_disparity(sc.left_bgr, sc.right_bgr, cfg)
    diff = np.abs(
        ref.astype(np.float64) - ours.astype(np.float64)
    ) / cfg.disparity_scale
    bad2 = (diff > 2.0).mean() * 100
    assert bad2 <= 2.0, f"bad2 vs reference output @128 disp = {bad2:.2f}%"
    assert (ref == ours).mean() > 0.97

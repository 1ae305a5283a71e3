"""Middlebury accuracy + timing harness (bad-δ metric).

The reference ships Middlebury GT (``Images/*/disp1.png``) but never
evaluates against it (SURVEY §4.4); this harness turns it into the
project's quantitative accuracy gate: bad-2.0 rate per scene and pipeline,
plus wall-clock per stage.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from gpu_stereo_matching_tpu.core.config import BlockMatchingConfig, SegmentTreeConfig
from gpu_stereo_matching_tpu.io.middlebury import (
    GT_SCALE,
    MiddleburyScene,
    bad_pixel_rate,
    list_middlebury_scenes,
    load_middlebury_scene,
    nonocc_mask,
)
from gpu_stereo_matching_tpu.models.block_matching import block_matching_pipeline
from gpu_stereo_matching_tpu.models.segment_tree import segment_tree_disparity
from gpu_stereo_matching_tpu.ops.color import gray_rec601_bgr


@dataclasses.dataclass
class SceneResult:
    scene: str
    pipeline: str
    bad2: Optional[float]          # all valid-GT pixels
    bad2_nonocc: Optional[float]   # non-occluded pixels (GT cross-check)
    seconds: float

    def as_dict(self) -> Dict:
        return dataclasses.asdict(self)


def evaluate_scene(
    scene: MiddleburyScene,
    pipeline: str = "st1",
    bm_config: BlockMatchingConfig = BlockMatchingConfig(num_disparities=80),
    # Evaluation config: disparity range covering the full GT range (the
    # reference CLI default of 60 levels truncates Art/Laundry at ~77), and
    # no output scaling (the reference's ×4 uint8 scaling saturates at 255
    # = 63.75 true disparities, which would corrupt the metric).
    st_config: SegmentTreeConfig = SegmentTreeConfig(
        max_disp_levels=80, disparity_scale=1
    ),
    delta: float = 2.0,
) -> SceneResult:
    """Run one pipeline on one scene; bad-δ against GT when available."""
    t0 = time.perf_counter()
    if pipeline in ("bm", "bm+"):
        if pipeline == "bm+":
            # BASELINE config 2: box aggregation + LR consistency + median.
            bm_config = dataclasses.replace(
                bm_config, lr_consistency=True, median_radius=3
            )
        gray = jax.jit(gray_rec601_bgr)  # eager ops are per-op round trips
        left = gray(jnp.asarray(scene.left_bgr))
        right = gray(jnp.asarray(scene.right_bgr))
        disp = np.asarray(block_matching_pipeline(left, right, bm_config))
        disp_scale = 1.0
    elif pipeline in ("st1", "st2"):
        cfg = dataclasses.replace(st_config, iterate=(pipeline == "st2"))
        disp = segment_tree_disparity(scene.left_bgr, scene.right_bgr, cfg)
        disp_scale = float(cfg.disparity_scale)
    elif pipeline in ("opencv-bm", "opencv-sgbm"):
        disp = _opencv_baseline(scene, pipeline, bm_config.num_disparities)
        disp_scale = 1.0
    else:
        raise ValueError(f"unknown pipeline {pipeline!r}")
    seconds = time.perf_counter() - t0

    bad2 = bad2_nonocc = None
    if scene.gt_left is not None:
        bad2 = bad_pixel_rate(
            disp, scene.gt_left, delta=delta, disp_scale=disp_scale, gt_scale=GT_SCALE
        )
        if scene.gt_right is not None:
            bad2_nonocc = bad_pixel_rate(
                disp, scene.gt_left, delta=delta, disp_scale=disp_scale,
                gt_scale=GT_SCALE,
                mask=nonocc_mask(scene.gt_left, scene.gt_right),
            )
    return SceneResult(
        scene=scene.name, pipeline=pipeline, bad2=bad2,
        bad2_nonocc=bad2_nonocc, seconds=seconds,
    )


def _opencv_baseline(scene: MiddleburyScene, pipeline: str, num_disp: int):
    """External OpenCV baselines — the reference's own comparison pattern
    (``BM_SBM`` wrapping ``cv::StereoBM``, ``Utility.cpp:67-95``). Never on
    the product path; requires cv2 at call time."""
    import cv2

    nd = ((num_disp + 15) // 16) * 16
    if pipeline == "opencv-bm":
        gl = cv2.cvtColor(scene.left_bgr, cv2.COLOR_BGR2GRAY)
        gr = cv2.cvtColor(scene.right_bgr, cv2.COLOR_BGR2GRAY)
        matcher = cv2.StereoBM_create(numDisparities=nd, blockSize=9)
        disp = matcher.compute(gl, gr)
    else:
        matcher = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=nd, blockSize=5,
            P1=8 * 3 * 25, P2=32 * 3 * 25,
            uniquenessRatio=10, speckleWindowSize=100, speckleRange=2,
        )
        disp = matcher.compute(scene.left_bgr, scene.right_bgr)
    return np.maximum(disp.astype(np.float64) / 16.0, 0.0)


def run_middlebury_suite(
    root: str,
    pipelines: List[str] = ("bm", "st1"),
    scenes: Optional[List[str]] = None,
    **kwargs,
) -> List[SceneResult]:
    names = scenes or list_middlebury_scenes(root, with_gt_only=True)
    results = []
    for name in names:
        scene = load_middlebury_scene(root, name)
        for pipeline in pipelines:
            res = evaluate_scene(scene, pipeline, **kwargs)
            results.append(res)
            bad = "n/a" if res.bad2 is None else f"{100 * res.bad2:.2f}%"
            non = "n/a" if res.bad2_nonocc is None else f"{100 * res.bad2_nonocc:.2f}%"
            print(
                f"{name:12s} {pipeline:4s} bad2={bad:>8s} nonocc={non:>8s}"
                f" {res.seconds * 1e3:8.1f} ms"
            )
    return results

"""Spatially-tiled segment-tree aggregation (distribution for the ST path).

The segment tree is global — it does not tile the way window ops do
(SURVEY §7 hard part 3). For multi-chip execution the practical scheme is
**independent per-tile trees**: the image is split into horizontal bands,
each band builds and filters its own spanning tree (host builds per band →
its own chip filters locally; no halo, no cross-chip traffic). This is an
approximation — aggregation support stops at band borders — so the
framework ships it together with a quantification harness
(:func:`tiling_accuracy_report`) that measures the bad-2.0 delta against
the global tree on Middlebury GT. Measured round-1 deltas are well inside
the 2% budget for ≤8 bands (see RESULTS.md).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from gpu_stereo_matching_tpu.core.config import SegmentTreeConfig
from gpu_stereo_matching_tpu.core.validation import check_bgr_pair
from gpu_stereo_matching_tpu.models.segment_tree import (
    _aggregate_select,
    _cost_volume_jit,
    _scale_u8,
)


def st1_disparity_tiled(
    left_bgr: np.ndarray,
    right_bgr: np.ndarray,
    num_tiles: int,
    config: SegmentTreeConfig = SegmentTreeConfig(),
) -> np.ndarray:
    """ST-1 with independent per-band segment trees → (H, W) uint8.

    Bands split H as evenly as possible; each band runs the full
    build→filter→WTA→median locally (the per-band work is what a ``space``
    shard executes in the distributed deployment).
    """
    check_bgr_pair(left_bgr, right_bgr, config.max_disp_levels, "st1_tiled")
    h = left_bgr.shape[0]
    cost = _cost_volume_jit(
        jnp.asarray(left_bgr), jnp.asarray(right_bgr), config.max_disp_levels
    )
    bounds = np.linspace(0, h, num_tiles + 1).astype(int)
    parts: List[np.ndarray] = []
    for t in range(num_tiles):
        y0, y1 = int(bounds[t]), int(bounds[t + 1])
        disp_band = _aggregate_select(
            cost[:, y0:y1, :], left_bgr[y0:y1], config.sigma, config
        )
        parts.append(disp_band)
    disp = np.concatenate(parts, axis=0)
    return _scale_u8(disp, config.disparity_scale)


def st2_disparity_tiled(
    left_bgr: np.ndarray,
    right_bgr: np.ndarray,
    num_tiles: int,
    config: SegmentTreeConfig = SegmentTreeConfig(),
) -> np.ndarray:
    """ST-2 with independent per-band pipelines → (H, W) uint8.

    Each band runs the FULL iteration pipeline on its crop — per-view
    trees (σ₁), LR consistency, and color+depth re-segmentation
    (``STMatching/StereoDisparity.cpp:91-159``) are all band-local. LR
    consistency only looks along rows, and the cost volume has no vertical
    taps, so the only cross-band interaction lost is tree support and the
    median/presmooth windows — the same approximation ST-1 tiling makes,
    quantified by :func:`tiling_accuracy_report` with ``method="st2"``.
    """
    from gpu_stereo_matching_tpu.models.segment_tree import st2_disparity

    check_bgr_pair(left_bgr, right_bgr, config.max_disp_levels, "st2_tiled")
    h = left_bgr.shape[0]
    bounds = np.linspace(0, h, num_tiles + 1).astype(int)
    parts: List[np.ndarray] = []
    for t in range(num_tiles):
        y0, y1 = int(bounds[t]), int(bounds[t + 1])
        parts.append(
            st2_disparity(left_bgr[y0:y1], right_bgr[y0:y1], config)
        )
    return np.concatenate(parts, axis=0)


def tiling_accuracy_report(
    scene,
    tile_counts=(1, 2, 4, 8),
    config: Optional[SegmentTreeConfig] = None,
    delta: float = 2.0,
):
    """bad-2.0 (all + nonocc) of per-band trees vs. the global tree."""
    from gpu_stereo_matching_tpu.io.middlebury import (
        GT_SCALE,
        bad_pixel_rate,
        nonocc_mask,
    )

    config = config or SegmentTreeConfig(max_disp_levels=80, disparity_scale=1)
    mask = (
        nonocc_mask(scene.gt_left, scene.gt_right)
        if scene.gt_right is not None
        else None
    )
    rows = []
    for s in tile_counts:
        disp = st1_disparity_tiled(scene.left_bgr, scene.right_bgr, s, config)
        bad = bad_pixel_rate(disp, scene.gt_left, delta=delta, gt_scale=GT_SCALE)
        bad_no = (
            bad_pixel_rate(
                disp, scene.gt_left, delta=delta, gt_scale=GT_SCALE, mask=mask
            )
            if mask is not None
            else None
        )
        rows.append({"tiles": s, "bad2": bad, "bad2_nonocc": bad_no})
        non = "n/a" if bad_no is None else f"{100 * bad_no:.2f}%"
        print(f"tiles={s}: bad2={100 * bad:.2f}% nonocc={non}")
    return rows

"""End-to-end ST-1 / ST-2 pipelines vs. composed NumPy oracles.

The parallel tree scans reorder float additions vs. the sequential oracle,
so near-tied WTA decisions can flip on a few pixels; stage-level tests
cover exactness (tolerance-checked filtered costs), and these end-to-end
tests gate on near-total agreement instead of bit equality.
"""

import numpy as np

from gpu_stereo_matching_tpu.core.config import SegmentTreeConfig
from gpu_stereo_matching_tpu.models.segment_tree import st1_disparity, st2_disparity
from gpu_stereo_matching_tpu.tree.builder import (
    build_segment_tree_py,
    color_edge_weights,
    color_depth_edge_weights,
)
from tests import oracles


def _assert_mostly_equal(got, want, min_agree=0.97):
    agree = float(np.mean(got == want))
    assert agree >= min_agree, f"only {agree:.3f} of pixels agree"


def _oracle_aggregate_select(cost, weights, sigma, cfg, weight_scale=1.0):
    d, h, w = cost.shape
    tree = build_segment_tree_py(
        weights, h, w, tau=cfg.tau, min_size=cfg.min_size_seg,
        penalty=cfg.penalty_cross_seg, weight_scale=weight_scale,
    )
    nodes = np.moveaxis(cost, 0, -1).reshape(h * w, d)
    filtered = oracles.tree_filter_oracle(
        nodes, tree.bfs_order, tree.parent, tree.parent_weights(sigma)
    )
    disp = oracles.wta_oracle(np.moveaxis(filtered.reshape(h, w, d), -1, 0))
    return oracles.median_oracle(disp.astype(np.uint8), 3)


def _st1_oracle(left, right, cfg):
    cost = oracles.color_grad_cost_volume_oracle(left, right, cfg.max_disp_levels)
    disp = _oracle_aggregate_select(cost, color_edge_weights(left), cfg.sigma, cfg)
    return np.minimum(disp.astype(np.int32) * cfg.disparity_scale, 255).astype(np.uint8)


def test_st1_matches_composed_oracle(rng):
    left = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    right = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    cfg = SegmentTreeConfig(max_disp_levels=6, tau=90.0, min_size_seg=5)
    got = st1_disparity(left, right, cfg)
    want = _st1_oracle(left, right, cfg)
    _assert_mostly_equal(got, want)


def test_st2_matches_composed_oracle(rng):
    left = rng.integers(0, 256, size=(9, 12, 3), dtype=np.uint8)
    right = rng.integers(0, 256, size=(9, 12, 3), dtype=np.uint8)
    cfg = SegmentTreeConfig(max_disp_levels=5, tau=90.0, min_size_seg=5)
    got = st2_disparity(left, right, cfg)

    cost_l = oracles.color_grad_cost_volume_oracle(left, right, cfg.max_disp_levels)
    cost_r = oracles.right_cost_from_left_oracle(cost_l)
    disp_l = _oracle_aggregate_select(
        cost_l, color_edge_weights(left), cfg.sigma_one, cfg
    )
    disp_r = _oracle_aggregate_select(
        cost_r, color_edge_weights(right), cfg.sigma_one, cfg
    )
    mask = oracles.lr_mask_oracle(
        disp_l.astype(np.int32), disp_r.astype(np.int32), cfg.lr_max_diff
    )
    cost = oracles.color_grad_cost_volume_oracle(left, right, cfg.max_disp_levels)
    weights = color_depth_edge_weights(
        left, disp_l, mask, cfg.max_disp_levels, cfg.alpha_dep_seg
    )
    disp = _oracle_aggregate_select(cost, weights, cfg.sigma, cfg, weight_scale=255.0)
    want = np.minimum(disp.astype(np.int32) * cfg.disparity_scale, 255).astype(np.uint8)
    _assert_mostly_equal(got, want)


def test_st1_tiled_single_band_equals_global(rng):
    from gpu_stereo_matching_tpu.models.segment_tree_tiled import st1_disparity_tiled

    left = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    right = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    cfg = SegmentTreeConfig(max_disp_levels=5, tau=90.0, min_size_seg=5)
    got = st1_disparity_tiled(left, right, 1, cfg)
    want = st1_disparity(left, right, cfg)
    np.testing.assert_array_equal(got, want)


def test_st1_tiled_two_bands_matches_per_band_oracle(rng):
    """Seam correctness: each band must equal the full ST-1 oracle run on
    that band alone (band-local tree, band-local cost slice, band-local
    median) — the concatenation over the band union, not just the shape."""
    from gpu_stereo_matching_tpu.models.segment_tree_tiled import st1_disparity_tiled

    left = rng.integers(0, 256, size=(14, 16, 3), dtype=np.uint8)
    right = rng.integers(0, 256, size=(14, 16, 3), dtype=np.uint8)
    cfg = SegmentTreeConfig(max_disp_levels=5, tau=90.0, min_size_seg=5)
    disp = st1_disparity_tiled(left, right, 2, cfg)
    assert disp.shape == (14, 16)

    cost = oracles.color_grad_cost_volume_oracle(left, right, cfg.max_disp_levels)
    bands = []
    for y0, y1 in ((0, 7), (7, 14)):
        band = _oracle_aggregate_select(
            cost[:, y0:y1], color_edge_weights(left[y0:y1]), cfg.sigma, cfg
        )
        bands.append(band)
    want = np.minimum(
        np.concatenate(bands, axis=0).astype(np.int32) * cfg.disparity_scale, 255
    ).astype(np.uint8)
    _assert_mostly_equal(disp, want, min_agree=0.97)
    # The seam rows themselves must agree too (not hide in the average).
    _assert_mostly_equal(disp[6:8], want[6:8], min_agree=0.9)


def test_video_pipeline_matches_per_frame(rng):
    from gpu_stereo_matching_tpu.models.segment_tree_stream import (
        SegmentTreeVideoPipeline,
    )

    cfg = SegmentTreeConfig(max_disp_levels=5, tau=90.0, min_size_seg=5)
    frames = [
        (
            rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8),
            rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8),
        )
        for _ in range(4)
    ]
    pipe = SegmentTreeVideoPipeline(cfg)
    got = list(pipe.process(iter(frames)))
    assert len(got) == 4
    for (l, r), d in zip(frames, got):
        want = st1_disparity(l, r, cfg)
        np.testing.assert_array_equal(d, want)


def test_video_pipeline_empty_and_single(rng):
    from gpu_stereo_matching_tpu.models.segment_tree_stream import (
        SegmentTreeVideoPipeline,
    )

    cfg = SegmentTreeConfig(max_disp_levels=4, tau=90.0, min_size_seg=5)
    pipe = SegmentTreeVideoPipeline(cfg)
    assert list(pipe.process(iter([]))) == []
    pair = (
        rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8),
    )
    out = list(pipe.process(iter([pair])))
    assert len(out) == 1 and out[0].shape == (8, 12)


def test_batch_pipeline_matches_per_frame(rng):
    """Batched (vmapped, grouped) streaming equals per-frame ST-1, incl. a
    short final group (padded internally, trimmed on output)."""
    from gpu_stereo_matching_tpu.models.segment_tree_stream import (
        SegmentTreeBatchPipeline,
    )

    cfg = SegmentTreeConfig(max_disp_levels=5, tau=90.0, min_size_seg=5)
    frames = [
        (
            rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8),
            rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8),
        )
        for _ in range(5)
    ]
    pipe = SegmentTreeBatchPipeline(cfg, group_size=4, workers=2)
    got = list(pipe.process(iter(frames)))
    assert len(got) == 5
    for (l, r), d in zip(frames, got):
        want = st1_disparity(l, r, cfg)
        np.testing.assert_array_equal(d, want)


def test_batch_pipeline_odd_group_size(rng):
    """Non-power-of-two groups are fine: the group dispatch is an unrolled
    per-frame loop over stacked plans, needing no scan alignment."""
    from gpu_stereo_matching_tpu.models.segment_tree_stream import (
        SegmentTreeBatchPipeline,
    )

    cfg = SegmentTreeConfig(max_disp_levels=5, tau=90.0, min_size_seg=5)
    frames = [
        (
            rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8),
            rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8),
        )
        for _ in range(4)
    ]
    pipe = SegmentTreeBatchPipeline(cfg, group_size=3, workers=2)
    got = list(pipe.process(iter(frames)))
    assert len(got) == 4
    for (l, r), d in zip(frames, got):
        want = st1_disparity(l, r, cfg)
        np.testing.assert_array_equal(d, want)


def test_batch_pipeline_empty(rng):
    from gpu_stereo_matching_tpu.models.segment_tree_stream import (
        SegmentTreeBatchPipeline,
    )

    cfg = SegmentTreeConfig(max_disp_levels=4, tau=90.0, min_size_seg=5)
    assert list(SegmentTreeBatchPipeline(cfg).process(iter([]))) == []


def test_banded_batch_pipeline_matches_tiled(rng):
    """Round-5 per-band-tree streaming (bands>1, the HD host-solvency
    path) equals st1_disparity_tiled bitwise per frame."""
    from gpu_stereo_matching_tpu.models.segment_tree_stream import (
        SegmentTreeBatchPipeline,
    )
    from gpu_stereo_matching_tpu.models.segment_tree_tiled import (
        st1_disparity_tiled,
    )

    cfg = SegmentTreeConfig(max_disp_levels=5, tau=90.0, min_size_seg=5)
    frames = [
        (
            rng.integers(0, 256, size=(12, 14, 3), dtype=np.uint8),
            rng.integers(0, 256, size=(12, 14, 3), dtype=np.uint8),
        )
        for _ in range(3)
    ]
    pipe = SegmentTreeBatchPipeline(cfg, group_size=2, workers=2, bands=2)
    got = list(pipe.process(iter(frames)))
    assert len(got) == 3
    for (l, r), d in zip(frames, got):
        want = st1_disparity_tiled(l, r, 2, cfg)
        np.testing.assert_array_equal(d, want)


def test_st2_batch_pipeline_matches_per_pair(rng):
    """Round-5 batched streaming ST-2 (two grouped dispatches + host
    rebuild) equals per-pair st2_disparity bitwise, incl. a short final
    group."""
    from gpu_stereo_matching_tpu.models.segment_tree_stream import (
        SegmentTreeST2BatchPipeline,
    )

    cfg = SegmentTreeConfig(max_disp_levels=5, tau=90.0, min_size_seg=5)
    frames = [
        (
            rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8),
            rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8),
        )
        for _ in range(5)
    ]
    pipe = SegmentTreeST2BatchPipeline(cfg, group_size=4, workers=2)
    got = list(pipe.process(iter(frames)))
    assert len(got) == 5
    for (l, r), d in zip(frames, got):
        want = st2_disparity(l, r, cfg)
        np.testing.assert_array_equal(d, want)


def test_st2_batch_pipeline_empty(rng):
    from gpu_stereo_matching_tpu.models.segment_tree_stream import (
        SegmentTreeST2BatchPipeline,
    )

    cfg = SegmentTreeConfig(max_disp_levels=4, tau=90.0, min_size_seg=5)
    assert list(SegmentTreeST2BatchPipeline(cfg).process(iter([]))) == []


def _art_crop(y0=120, y1=184, x0=140, x1=268):
    """A real Art crop (textured region) — near-ties are rare on natural
    images, so the end-to-end agreement gate can be tight (VERDICT r1:
    random-noise inputs made the 97% gate loose)."""
    import os

    from gpu_stereo_matching_tpu.io.images import load_image_bgr

    root = "/root/reference/Images/Art"
    if not os.path.isdir(root):
        import pytest

        pytest.skip("reference Middlebury assets unavailable")
    left = load_image_bgr(os.path.join(root, "view1.png"))
    right = load_image_bgr(os.path.join(root, "view5.png"))
    return left[y0:y1, x0:x1], right[y0:y1, x0:x1]


def test_st1_real_image_matches_oracle_tightly():
    left, right = _art_crop()
    cfg = SegmentTreeConfig(max_disp_levels=24, disparity_scale=4)
    got = st1_disparity(left, right, cfg)
    want = _st1_oracle(left, right, cfg)
    _assert_mostly_equal(got, want, min_agree=0.995)


def test_st2_real_image_matches_oracle_tightly():
    left, right = _art_crop()
    cfg = SegmentTreeConfig(max_disp_levels=24, disparity_scale=4)
    got = st2_disparity(left, right, cfg)

    cost_l = oracles.color_grad_cost_volume_oracle(left, right, cfg.max_disp_levels)
    cost_r = oracles.right_cost_from_left_oracle(cost_l)
    disp_l = _oracle_aggregate_select(
        cost_l, color_edge_weights(left), cfg.sigma_one, cfg
    )
    disp_r = _oracle_aggregate_select(
        cost_r, color_edge_weights(right), cfg.sigma_one, cfg
    )
    mask = oracles.lr_mask_oracle(
        disp_l.astype(np.int32), disp_r.astype(np.int32), cfg.lr_max_diff
    )
    cost = oracles.color_grad_cost_volume_oracle(left, right, cfg.max_disp_levels)
    weights = color_depth_edge_weights(
        left, disp_l, mask, cfg.max_disp_levels, cfg.alpha_dep_seg
    )
    disp = _oracle_aggregate_select(cost, weights, cfg.sigma, cfg, weight_scale=255.0)
    want = np.minimum(disp.astype(np.int32) * cfg.disparity_scale, 255).astype(np.uint8)
    _assert_mostly_equal(got, want, min_agree=0.995)


def test_st1_config3_128_disparities():
    """Config-3 disparity count (BASELINE.md: ST at 128 levels): the
    packed plan layouts and the filter's (N, 128) channel width must hold
    up; gate on tight agreement with the composed oracle on a real crop."""
    left, right = _art_crop()
    cfg = SegmentTreeConfig(max_disp_levels=128, disparity_scale=1)
    got = st1_disparity(left, right, cfg)
    want = _st1_oracle(left, right, cfg)
    _assert_mostly_equal(got, want, min_agree=0.995)

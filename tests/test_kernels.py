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


def test_fused_mxu_variant_bitwise(rng):
    """Round-5 banded-MXU vertical-sum variant is bit-identical to the
    VPU packed-pair kernel (bf16 diffs <=255 and f32 accumulation are
    exact; gated here in interpret mode, on hardware by
    tools/exp_mxu_sad.py's checksum)."""
    for hw, d, r, th in [((21, 33), 8, 2, 8), ((40, 150), 16, 3, 16),
                         ((37, 160), 64, 5, 16)]:
        left = rng.integers(0, 256, size=hw, dtype=np.uint8)
        right = rng.integers(0, 256, size=hw, dtype=np.uint8)
        want = np.asarray(
            fused_block_matching(
                jnp.asarray(left), jnp.asarray(right),
                num_disparities=d, radius=r, tile_h=th, interpret=True,
            )
        )
        got = np.asarray(
            fused_block_matching(
                jnp.asarray(left), jnp.asarray(right),
                num_disparities=d, radius=r, tile_h=th, interpret=True,
                mxu=True,
            )
        )
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


def test_packed_pair_gate():
    from gpu_stereo_matching_tpu.kernels.sad_wta import _packed_pair_supported

    assert _packed_pair_supported(64, 5)          # reference default config
    assert not _packed_pair_supported(63, 5)      # odd count -> legacy
    assert not _packed_pair_supported(64, 6)      # 255*13*13 >= 2^15 overflow
    assert not _packed_pair_supported(64, 0)      # no window -> legacy
    assert not _packed_pair_supported(512, 3)     # d needs 8 bits in the key


@pytest.mark.parametrize("num_d,radius", [(7, 2), (8, 6)])
def test_fused_legacy_fallback_paths(rng, num_d, radius):
    """Odd counts / large radii take the unpacked kernel; still exact."""
    left = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    right = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    got = np.asarray(
        fused_block_matching(
            jnp.asarray(left), jnp.asarray(right),
            num_disparities=num_d, radius=radius, tile_h=8, interpret=True,
        )
    )
    want = _oracle_disparity(left, right, num_d, radius)
    np.testing.assert_array_equal(got, want)


def test_packed_pair_matches_legacy_kernel(rng):
    """The packed-pair and unpacked kernels agree bit-for-bit.

    Runs the unpacked kernel directly (bypassing the dispatch gate) against
    the public path, which takes the packed kernel for this config.
    """
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gpu_stereo_matching_tpu.kernels import sad_wta

    h, w, num_d, radius, tile_h = 26, 150, 16, 5, 8
    left = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    right = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert sad_wta._packed_pair_supported(num_d, radius)
    packed = np.asarray(
        fused_block_matching(
            jnp.asarray(left), jnp.asarray(right),
            num_disparities=num_d, radius=radius, tile_h=tile_h,
            interpret=True,
        )
    )

    r = radius
    num_tiles = -(-h // tile_h)
    hp = num_tiles * tile_h
    slab_rows = -(-(tile_h + 2 * r) // 8) * 8
    total_rows = max((num_tiles - 1) * tile_h + slab_rows, hp + 2 * r)
    wp = -(-w // 128) * 128
    left_p = jnp.zeros((total_rows, wp), jnp.uint8)
    left_p = jax.lax.dynamic_update_slice(left_p, jnp.asarray(left), (r, 0))
    right_p = jnp.zeros((total_rows, wp), jnp.uint8)
    right_p = jax.lax.dynamic_update_slice(right_p, jnp.asarray(right), (r, 0))
    kernel = functools.partial(
        sad_wta._kernel,
        num_disparities=num_d, radius=r, tile_h=tile_h,
        true_width=w, invalid_cost=255,
    )
    legacy = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, wp), jnp.uint8),
            pltpu.VMEM((slab_rows, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=True,
    )(left_p, right_p)
    np.testing.assert_array_equal(packed, np.asarray(legacy)[:h, :w])


def test_fused_key_kernel_partial_ranges(rng):
    from gpu_stereo_matching_tpu.kernels.sad_wta import fused_block_matching_key

    left = rng.integers(0, 256, size=(14, 20), dtype=np.uint8)
    right = rng.integers(0, 256, size=(14, 20), dtype=np.uint8)
    num_d, radius = 8, 2
    vol = oracles.ad_cost_volume_oracle(left, right, num_d)
    sad = oracles.box_sum_oracle(vol, radius)
    keys_parts = []
    # (0,4)/(4,4) take the packed-pair kernel; (0,3)/(3,5)... odd counts
    # take the legacy kernel — both splits must reduce to the same WTA.
    for d0, count in [(0, 4), (4, 4), (0, 3), (3, 5)]:
        keys = np.asarray(
            fused_block_matching_key(
                jnp.asarray(left), jnp.asarray(right), d0, count, num_d,
                radius, tile_h=8, interpret=True,
            )
        )
        keys_parts.append(keys)
    combined = np.minimum.reduce(keys_parts)
    want_disp = oracles.wta_oracle(sad)
    np.testing.assert_array_equal(combined % num_d, want_disp)


@pytest.mark.parametrize(
    "hw_r", [((20, 30), 1), ((33, 150), 4), ((40, 260), 7), ((16, 128), 9)]
)
def test_ctmf_median_matches_oracles(rng, hw_r):
    """The two-tier histogram Pallas median (CTMF analog, ctmf.c:98-339)
    is bit-identical to both median_filter_u8 paths."""
    from gpu_stereo_matching_tpu.kernels.ctmf_median import ctmf_median_u8
    from gpu_stereo_matching_tpu.ops.postprocess import median_filter_u8

    (h, w), r = hw_r
    x = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    got = np.asarray(ctmf_median_u8(x, r, interpret=True))
    np.testing.assert_array_equal(
        got, np.asarray(median_filter_u8(x, r, method="histogram"))
    )
    np.testing.assert_array_equal(
        got, np.asarray(median_filter_u8(x, r, method="sort"))
    )


def test_ctmf_median_valid_mask(rng):
    from gpu_stereo_matching_tpu.kernels.ctmf_median import ctmf_median_u8
    from gpu_stereo_matching_tpu.ops.postprocess import median_filter_u8

    h, w, r = 26, 140, 4
    x = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    mask = jnp.asarray(rng.random((h, w)) > 0.3)
    got = np.asarray(ctmf_median_u8(x, r, valid_mask=mask, interpret=True))
    want = np.asarray(
        median_filter_u8(x, r, method="histogram", valid_mask=mask)
    )
    np.testing.assert_array_equal(got, want)


def test_ctmf_median_constant_and_extremes(rng):
    from gpu_stereo_matching_tpu.kernels.ctmf_median import ctmf_median_u8

    x = jnp.full((17, 131), 255, jnp.uint8)
    np.testing.assert_array_equal(
        np.asarray(ctmf_median_u8(x, 4, interpret=True)), np.asarray(x)
    )
    z = jnp.zeros((17, 131), jnp.uint8)
    np.testing.assert_array_equal(
        np.asarray(ctmf_median_u8(z, 4, interpret=True)), np.asarray(z)
    )


def test_split_phase_sad_volume_matches_ops(rng):
    """Phase-1 Pallas SAD volume == XLA ops path (materialized volume)."""
    from gpu_stereo_matching_tpu.kernels.split_phase import sad_volume
    from gpu_stereo_matching_tpu.ops.aggregate import aggregate_cost_volume
    from gpu_stereo_matching_tpu.ops.cost import ad_cost_volume

    h, w, num_d, radius = 21, 140, 8, 2
    left = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    right = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    got = np.asarray(
        sad_volume(
            jnp.asarray(left), jnp.asarray(right), num_d, radius,
            tile_h=8, interpret=True,
        )
    )
    want = np.asarray(
        aggregate_cost_volume(
            ad_cost_volume(jnp.asarray(left), jnp.asarray(right), num_d),
            radius,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_split_phase_matches_fused(rng):
    """Split-phase (volume + argmin kernels) == fused kernel, bit-exact —
    the corrected completion of Device.cu:67-125 (which never wrote the
    argmin)."""
    from gpu_stereo_matching_tpu.kernels.split_phase import (
        split_phase_block_matching,
    )

    h, w, num_d, radius = 26, 150, 16, 5
    left = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    right = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    got = np.asarray(
        split_phase_block_matching(
            jnp.asarray(left), jnp.asarray(right), num_d, radius,
            interpret=True,
        )
    )
    want = np.asarray(
        fused_block_matching(
            jnp.asarray(left), jnp.asarray(right),
            num_disparities=num_d, radius=radius, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)

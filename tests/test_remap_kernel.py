"""Pallas sweep-plan remap vs. the XLA gather path (interpret mode).

Maps are constructed with fractional parts away from exact .5 so results
must be *bit-identical*: at an exact-half rounding boundary a 1-ulp FMA
difference between backends may legally flip round-to-nearest-even by one
gray level (the reference's CPU/GPU remap pair has the same looseness).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gpu_stereo_matching_tpu.kernels.remap import (
    build_remap_plan,
    remap_bilinear_u8_planned,
)
from gpu_stereo_matching_tpu.ops.remap import remap_bilinear_u8


def _grids(h, w):
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.float32),
        np.arange(w, dtype=np.float32),
        indexing="ij",
    )
    return yy, xx


def _check_exact(src, mx, my):
    plan = build_remap_plan(mx, my, src.shape)
    assert plan is not None
    got = np.asarray(
        remap_bilinear_u8_planned(jnp.asarray(src), plan, interpret=True)
    )
    want = np.asarray(
        remap_bilinear_u8(jnp.asarray(src), jnp.asarray(mx), jnp.asarray(my))
    )
    np.testing.assert_array_equal(got, want)
    return plan


def test_planned_remap_smooth_warp(rng):
    h, w = 96, 200
    src = rng.integers(0, 256, (h, w), dtype=np.uint8)
    yy, xx = _grids(h, w)
    mx = (xx + 5.3 * np.sin(yy / 31.0) + 0.1).astype(np.float32)
    my = (yy + 2.1 * np.cos(xx / 53.0) - 1.7).astype(np.float32)
    _check_exact(src, mx, my)


def test_planned_remap_out_of_bounds_regions(rng):
    h, w = 96, 200
    src = rng.integers(0, 256, (h, w), dtype=np.uint8)
    yy, xx = _grids(h, w)
    mx = (xx - 12.3 + 5.3 * np.sin(yy / 31.0)).astype(np.float32)
    my = (yy + 8.2 + 2.1 * np.cos(xx / 53.0)).astype(np.float32)
    plan = _check_exact(src, mx, my)
    # The left strip really is invalid and outputs 0.
    got = np.asarray(
        remap_bilinear_u8_planned(jnp.asarray(src), plan, interpret=True)
    )
    assert (got[:, :5] == 0).all()


def test_planned_remap_identity(rng):
    h, w = 40, 136
    src = rng.integers(0, 256, (h, w), dtype=np.uint8)
    yy, xx = _grids(h, w)
    plan = _check_exact(src, xx.astype(np.float32), yy.astype(np.float32))
    assert plan.num_pairs == 1


def test_planned_remap_random_jitter(rng):
    h, w = 64, 144
    src = rng.integers(0, 256, (h, w), dtype=np.uint8)
    yy, xx = _grids(h, w)
    mx = (xx + rng.uniform(-3, 3, (h, w)) * 0.99 + 0.005).astype(np.float32)
    my = (yy + rng.uniform(-3, 3, (h, w)) * 0.99 + 0.005).astype(np.float32)
    _check_exact(src, mx, my)


def test_planned_remap_fallback_none_when_wild(rng):
    h, w = 32, 140
    yy, xx = _grids(h, w)
    # All destinations out of bounds -> no pairs -> no plan.
    assert build_remap_plan((xx - 500).astype(np.float32),
                            yy.astype(np.float32), (h, w)) is None
    # Scrambled map: too many distinct offsets for the sweep budget.
    mx = rng.uniform(0, w - 2, (h, w)).astype(np.float32)
    my = rng.uniform(0, h - 2, (h, w)).astype(np.float32)
    assert build_remap_plan(mx, my, (h, w), max_pairs=64) is None


def test_planned_remap_output_size_differs(rng):
    h, w = 48, 160
    src = rng.integers(0, 256, (h, w), dtype=np.uint8)
    oh, ow = 32, 96
    yy, xx = _grids(oh, ow)
    mx = (xx * 1.3 + 3.2).astype(np.float32)
    my = (yy * 1.1 + 2.3).astype(np.float32)
    _check_exact(src, mx, my)


def test_rig_uses_planned_remap(tmp_path, rng):
    """StereoRig builds remap plans when the pallas path is on."""
    from gpu_stereo_matching_tpu.core.config import BlockMatchingConfig
    from gpu_stereo_matching_tpu.models.streaming import StereoRig
    from gpu_stereo_matching_tpu.utils.cache import ArtifactCache
    from tests.test_streaming import tiny_calib  # fixture function

    calib = tiny_calib.__wrapped__()
    cfg = BlockMatchingConfig(num_disparities=4, sad_radius=1)
    rig = StereoRig(
        calib, (24, 32), cfg,
        cache=ArtifactCache(str(tmp_path)), use_pallas=True,
    )
    assert rig._remap_plans[0] is not None
    assert rig._remap_plans[1] is not None


def test_tiled_and_global_sweep_agree(rng):
    """The per-tile sweep kernel and the global static sweep produce
    identical bytes (same taps, same select order per pixel)."""
    h, w = 96, 200
    src = rng.integers(0, 256, (h, w), dtype=np.uint8)
    yy, xx = _grids(h, w)
    mx = (xx + 5.3 * np.sin(yy / 31.0) + 0.1).astype(np.float32)
    my = (yy + 2.1 * np.cos(xx / 53.0) - 1.7).astype(np.float32)
    plan = build_remap_plan(mx, my, src.shape)
    got_t = np.asarray(
        remap_bilinear_u8_planned(jnp.asarray(src), plan, interpret=True)
    )
    got_g = np.asarray(
        remap_bilinear_u8_planned(
            jnp.asarray(src), plan, interpret=True, tiled=False
        )
    )
    np.testing.assert_array_equal(got_t, got_g)

"""Calibrated-rig streaming pipeline: rectify → remap → fused block matching.

The production analog of the reference's ``remapTest`` + ``singleFrame``
demos (``BlockMatching/Caller.cpp``) as one engine: rectification maps are
precomputed once per calibration (host, cached), and every frame pair runs
a single jitted device program — gray conversion, bilinear remap through
the maps, and the fused Pallas SAD+WTA kernel — so steady-state streaming
has zero host-side math and one dispatch per frame (or per batch).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpu_stereo_matching_tpu.calib.rectify import rectification_maps_from_calibration
from gpu_stereo_matching_tpu.core.config import BlockMatchingConfig
from gpu_stereo_matching_tpu.io.calib_yaml import StereoCalibration
from gpu_stereo_matching_tpu.kernels.sad_wta import fused_block_matching
from gpu_stereo_matching_tpu.ops.color import gray_blockmatching_bgr
from gpu_stereo_matching_tpu.ops.remap import remap_bilinear_u8
from gpu_stereo_matching_tpu.utils.cache import ArtifactCache, content_key
from gpu_stereo_matching_tpu.utils.profiling import StageTimer


class StereoRig:
    """Streaming disparity engine for one calibrated stereo rig."""

    def __init__(
        self,
        calib: StereoCalibration,
        image_size_hw: Tuple[int, int],
        config: BlockMatchingConfig = BlockMatchingConfig(),
        cache: Optional[ArtifactCache] = None,
        use_pallas: bool = True,
    ) -> None:
        self.config = config
        self.image_size_hw = image_size_hw
        cache = cache or ArtifactCache()
        key = content_key(
            "rectify-maps",
            calib.left_intrinsics, calib.left_distortion,
            calib.right_intrinsics, calib.right_distortion,
            calib.rotation, calib.translation, image_size_hw,
        )
        (lmx, lmy), (rmx, rmy) = cache.get_or_compute(
            key, lambda: rectification_maps_from_calibration(calib, image_size_hw)
        )
        self._maps = tuple(jnp.asarray(m) for m in (lmx, lmy, rmx, rmy))

        # Pallas sweep-plan remap (kernels/remap.py) when the maps fit its
        # bounded-offset form; XLA gather fallback otherwise.
        from gpu_stereo_matching_tpu.kernels.remap import (
            build_remap_plan,
            remap_bilinear_u8_planned,
        )

        self._remap_plans = (
            (
                build_remap_plan(lmx, lmy, image_size_hw),
                build_remap_plan(rmx, rmy, image_size_hw),
            )
            if use_pallas
            else (None, None)
        )

        num_d, radius = config.num_disparities, config.sad_radius
        lplan, rplan = self._remap_plans

        def frame_step(left_bgr, right_bgr, lmx, lmy, rmx, rmy):
            gl = gray_blockmatching_bgr(left_bgr)
            gr = gray_blockmatching_bgr(right_bgr)
            rl = (
                remap_bilinear_u8_planned(gl, lplan)
                if lplan is not None
                else remap_bilinear_u8(gl, lmx, lmy)
            )
            rr = (
                remap_bilinear_u8_planned(gr, rplan)
                if rplan is not None
                else remap_bilinear_u8(gr, rmx, rmy)
            )
            if use_pallas:
                return fused_block_matching(rl, rr, num_d, radius)
            from gpu_stereo_matching_tpu.models.block_matching import (
                block_matching_disparity,
            )

            return block_matching_disparity(rl, rr, config)

        self._frame_step = jax.jit(frame_step)
        self._batch_step = jax.jit(
            lambda lb, rb, a, b, c, d: jax.lax.map(
                lambda lr: frame_step(lr[0], lr[1], a, b, c, d), (lb, rb)
            )
        )

    def process(self, left_bgr, right_bgr, timer: Optional[StageTimer] = None):
        """One (H, W, 3) uint8 BGR pair → (H, W) int32 disparity."""
        out = self._frame_step(jnp.asarray(left_bgr), jnp.asarray(right_bgr), *self._maps)
        if timer is not None:
            with timer.stage("frame", fence=out):
                pass
        return out

    def process_batch(self, left_bgr, right_bgr):
        """(B, H, W, 3) uint8 BGR batches → (B, H, W) int32 disparities."""
        return self._batch_step(
            jnp.asarray(left_bgr), jnp.asarray(right_bgr), *self._maps
        )


def rig_from_yaml(
    path: str,
    image_size_hw: Tuple[int, int],
    config: BlockMatchingConfig = BlockMatchingConfig(),
    scale_intrinsics_from: Optional[Tuple[int, int]] = None,
) -> StereoRig:
    """Build a rig from an OpenCV calibration YAML.

    ``scale_intrinsics_from``: original calibration resolution (H, W) if the
    rig runs at a different ``image_size_hw`` (intrinsics are rescaled).
    """
    import dataclasses as dc

    from gpu_stereo_matching_tpu.io.calib_yaml import load_opencv_stereo_yaml

    calib = load_opencv_stereo_yaml(path)
    if scale_intrinsics_from is not None:
        sy = image_size_hw[0] / scale_intrinsics_from[0]
        sx = image_size_hw[1] / scale_intrinsics_from[1]
        k1 = calib.left_intrinsics.copy()
        k2 = calib.right_intrinsics.copy()
        k1[0] *= sx
        k1[1] *= sy
        k2[0] *= sx
        k2[1] *= sy
        calib = dc.replace(calib, left_intrinsics=k1, right_intrinsics=k2)
    return StereoRig(calib, image_size_hw, config)

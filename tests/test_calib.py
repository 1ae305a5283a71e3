"""Calibration loading + Bouguet rectification vs. the OpenCV oracle.

OpenCV is used strictly as an external cross-check (the reference's own
baseline pattern, ``Utility.cpp:67-95``); the product path never imports it.
"""

import os

import numpy as np
import pytest

from gpu_stereo_matching_tpu.calib.rectify import (
    rectification_maps_from_calibration,
    stereo_rectify,
    undistort_rectify_maps,
)
from gpu_stereo_matching_tpu.io.calib_yaml import load_opencv_stereo_yaml

CALIB_PATH = "/root/reference/Calib_Data_OpenCV.yml"

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def calib():
    if not os.path.exists(CALIB_PATH):
        pytest.skip("reference calibration file not available")
    return load_opencv_stereo_yaml(CALIB_PATH)


def test_yaml_values(calib):
    assert calib.left_intrinsics.shape == (3, 3)
    np.testing.assert_allclose(calib.left_intrinsics[0, 0], 1116.744104)
    np.testing.assert_allclose(calib.translation[0], -46.993557)
    assert calib.left_distortion.shape == (5,)


def test_stereo_rectify_vs_opencv(calib):
    size_hw = (200, 320)  # the remapTest working size (Caller.cpp:35)
    got = stereo_rectify(
        calib.left_intrinsics,
        calib.left_distortion,
        calib.right_intrinsics,
        calib.right_distortion,
        size_hw,
        calib.rotation,
        calib.translation,
    )
    r1, r2, p1, p2, q, _, _ = cv2.stereoRectify(
        calib.left_intrinsics,
        calib.left_distortion,
        calib.right_intrinsics,
        calib.right_distortion,
        (size_hw[1], size_hw[0]),
        calib.rotation,
        calib.translation.reshape(3, 1),
        flags=cv2.CALIB_ZERO_DISPARITY,
        alpha=-1,
    )
    np.testing.assert_allclose(got.R1, r1, atol=1e-8)
    np.testing.assert_allclose(got.R2, r2, atol=1e-8)
    np.testing.assert_allclose(got.P1, p1, atol=5e-3)
    np.testing.assert_allclose(got.P2, p2, atol=5e-3)
    np.testing.assert_allclose(got.Q, q, atol=5e-3)


def test_rectify_maps_vs_opencv(calib):
    size_hw = (200, 320)
    (lmx, lmy), (rmx, rmy) = rectification_maps_from_calibration(calib, size_hw)
    ref = cv2.stereoRectify(
        calib.left_intrinsics,
        calib.left_distortion,
        calib.right_intrinsics,
        calib.right_distortion,
        (size_hw[1], size_hw[0]),
        calib.rotation,
        calib.translation.reshape(3, 1),
        flags=cv2.CALIB_ZERO_DISPARITY,
        alpha=-1,
    )
    r1, r2, p1, p2 = ref[0], ref[1], ref[2], ref[3]
    cv_lmx, cv_lmy = cv2.initUndistortRectifyMap(
        calib.left_intrinsics, calib.left_distortion, r1, p1,
        (size_hw[1], size_hw[0]), cv2.CV_32FC1,
    )
    cv_rmx, cv_rmy = cv2.initUndistortRectifyMap(
        calib.right_intrinsics, calib.right_distortion, r2, p2,
        (size_hw[1], size_hw[0]), cv2.CV_32FC1,
    )
    np.testing.assert_allclose(lmx, cv_lmx, atol=2e-3)
    np.testing.assert_allclose(lmy, cv_lmy, atol=2e-3)
    np.testing.assert_allclose(rmx, cv_rmx, atol=2e-3)
    np.testing.assert_allclose(rmy, cv_rmy, atol=2e-3)


def test_undistort_rectify_maps_identity():
    k = np.array([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1]])
    maps = undistort_rectify_maps(
        k, np.zeros(5), np.eye(3), np.hstack([k, np.zeros((3, 1))]), (48, 64)
    )
    u, v = np.meshgrid(np.arange(64, dtype=np.float32), np.arange(48, dtype=np.float32))
    np.testing.assert_allclose(maps[0], u, atol=1e-4)
    np.testing.assert_allclose(maps[1], v, atol=1e-4)

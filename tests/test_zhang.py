"""Zhang calibration on synthetic chessboard views: parameter recovery."""

import numpy as np

from gpu_stereo_matching_tpu.calib.rectify import _rodrigues_to_matrix
from gpu_stereo_matching_tpu.calib.zhang import (
    calibrate_camera,
    chessboard_object_points,
    estimate_homography,
    project_points,
    stereo_calibrate,
)

K_TRUE = np.array([[900.0, 0.0, 320.0], [0.0, 890.0, 240.0], [0.0, 0.0, 1.0]])
DIST_TRUE = np.array([0.04, -0.15, 0.001, -0.0005, 0.0])


def _synthetic_views(rng, n_views, k, dist, jitter=0.0):
    obj = chessboard_object_points(9, 6, square_size=25.0)
    rvecs, tvecs, img_pts = [], [], []
    for i in range(n_views):
        rv = rng.uniform(-0.35, 0.35, 3)
        tv = np.array([
            rng.uniform(-60, 60), rng.uniform(-40, 40), rng.uniform(600, 900)
        ])
        pts = project_points(obj, rv, tv, k, dist)
        if jitter:
            pts = pts + rng.normal(0, jitter, pts.shape)
        rvecs.append(rv)
        tvecs.append(tv)
        img_pts.append(pts)
    return obj, rvecs, tvecs, img_pts


def test_homography_roundtrip(rng):
    obj = chessboard_object_points(9, 6, 25.0)
    h_true = np.array([[1.1, 0.02, 5.0], [-0.03, 0.95, -3.0], [1e-4, -2e-4, 1.0]])
    pts = np.hstack([obj, np.ones((len(obj), 1))]) @ h_true.T
    pts = pts[:, :2] / pts[:, 2:3]
    h = estimate_homography(obj, pts)
    np.testing.assert_allclose(h, h_true, atol=1e-8)


def test_calibrate_camera_recovers_parameters(rng):
    obj, _, _, img_pts = _synthetic_views(rng, 8, K_TRUE, DIST_TRUE)
    cal = calibrate_camera(obj, img_pts)
    assert cal.rms_error < 1e-5
    np.testing.assert_allclose(cal.intrinsics, K_TRUE, atol=0.05)
    np.testing.assert_allclose(cal.distortion, DIST_TRUE, atol=1e-4)


def test_calibrate_camera_noisy(rng):
    obj, _, _, img_pts = _synthetic_views(rng, 12, K_TRUE, DIST_TRUE, jitter=0.3)
    cal = calibrate_camera(obj, img_pts)
    assert cal.rms_error < 0.5
    np.testing.assert_allclose(cal.intrinsics[0, 0], K_TRUE[0, 0], rtol=0.01)
    np.testing.assert_allclose(cal.intrinsics[1, 2], K_TRUE[1, 2], rtol=0.02)


def test_stereo_calibrate_recovers_rig(rng):
    r_true = _rodrigues_to_matrix(np.array([0.01, 0.03, -0.005]))
    t_true = np.array([-47.0, -0.1, -0.3])
    k2 = K_TRUE * np.array([[1.01], [1.005], [1.0]])
    obj = chessboard_object_points(9, 6, 25.0)
    lp, rp, rvl, tvl = [], [], [], []
    for i in range(8):
        rv = rng.uniform(-0.3, 0.3, 3)
        tv = np.array([
            rng.uniform(-50, 50), rng.uniform(-30, 30), rng.uniform(600, 900)
        ])
        r_l = _rodrigues_to_matrix(rv)
        lp.append(project_points(obj, rv, tv, K_TRUE, DIST_TRUE))
        r_r = r_true @ r_l
        t_r = r_true @ tv + t_true
        from gpu_stereo_matching_tpu.calib.rectify import _matrix_to_rodrigues

        rp.append(project_points(obj, _matrix_to_rodrigues(r_r), t_r, k2, DIST_TRUE))
        rvl.append(rv)
        tvl.append(tv)

    cal_l = calibrate_camera(obj, lp)
    cal_r = calibrate_camera(obj, rp)
    res = stereo_calibrate(obj, lp, rp, cal_l, cal_r)
    assert res.rms_error < 1e-3
    np.testing.assert_allclose(res.rotation, r_true, atol=1e-5)
    np.testing.assert_allclose(res.translation, t_true, atol=1e-2)

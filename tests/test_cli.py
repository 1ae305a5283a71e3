"""CLI drivers end-to-end on tiny fixtures (CPU)."""

import numpy as np
import pytest

from gpu_stereo_matching_tpu.cli.main import main
from gpu_stereo_matching_tpu.io.images import load_image_bgr, load_image_gray, save_image


@pytest.fixture
def pair(tmp_path, rng):
    left = rng.integers(0, 256, size=(20, 40, 3), dtype=np.uint8)
    right = np.roll(left, -2, axis=1)  # uniform disparity 2
    lp, rp = str(tmp_path / "l.png"), str(tmp_path / "r.png")
    save_image(lp, left)
    save_image(rp, right)
    return lp, rp


def test_cli_bm(pair, tmp_path):
    lp, rp = pair
    out = str(tmp_path / "disp.png")
    assert main(["bm", lp, rp, out, "--disparities", "8", "--radius", "2",
                 "--scale", "1"]) == 0
    disp = load_image_gray(out)
    # interior should recover the uniform shift of 2
    interior = disp[5:-5, 12:-12]
    assert (interior == 2).mean() > 0.9


def test_cli_bm_colorize(pair, tmp_path):
    lp, rp = pair
    out = str(tmp_path / "disp_color.png")
    assert main(["bm", lp, rp, out, "--disparities", "8", "--radius", "2",
                 "--colorize"]) == 0
    img = load_image_bgr(out)
    assert img.shape == (20, 40, 3)


def test_cli_st(pair, tmp_path):
    lp, rp = pair
    out = str(tmp_path / "disp_st.png")
    assert main(["st", lp, rp, out, "--max-disp", "8", "--scale", "1"]) == 0
    disp = load_image_gray(out)
    interior = disp[5:-5, 12:-12]
    assert (interior == 2).mean() > 0.8


def test_cli_rectify(tmp_path, rng):
    import os

    calib = "/root/reference/Calib_Data_OpenCV.yml"
    left = "/root/reference/Chess/Set2/Left_0.jpg"
    if not (os.path.exists(calib) and os.path.exists(left)):
        pytest.skip("reference chess data unavailable")
    right = "/root/reference/Chess/Set2/Right_0.jpg"
    prefix = str(tmp_path / "rect")
    assert main(["rectify", "--calib", calib, "--left", left, "--right", right,
                 "--size", "160x100", "--out-prefix", prefix]) == 0
    out = load_image_gray(prefix + "_left.png")
    assert out.shape == (100, 160)
    assert out.mean() > 10  # mostly valid remapped content


def test_cli_calibrate(tmp_path, rng):
    """calibrate subcommand end-to-end on synthetic chessboard captures."""
    from tests.test_chessboard import render_board
    from gpu_stereo_matching_tpu.io.calib_yaml import load_opencv_stereo_yaml

    cols = rows = 6
    views = [
        np.array([[1.0, 0.03, 30.0], [0.02, 1.0, 24.0], [0, 0, 1.0]]),
        np.array([[0.96, -0.02, 44.0], [0.03, 1.02, 30.0], [1e-4, 0, 1.0]]),
        np.array([[1.05, 0.01, 22.0], [-0.02, 0.97, 40.0], [0, 1e-4, 1.0]]),
        np.array([[0.99, 0.05, 36.0], [0.01, 1.04, 20.0], [-1e-4, 1e-4, 1.0]]),
    ]
    # The right camera sees the same boards shifted (a crude baseline).
    shift = np.array([[1.0, 0, -6.0], [0, 1.0, 0], [0, 0, 1.0]])
    size = (260, 300)
    for i, h_mat in enumerate(views):
        img_l, _ = render_board(cols, rows, square=24, h_mat=h_mat,
                                size=size, noise=1.0, rng=rng)
        img_r, _ = render_board(cols, rows, square=24, h_mat=shift @ h_mat,
                                size=size, noise=1.0, rng=rng)
        save_image(str(tmp_path / f"Left_{i}.png"), img_l)
        save_image(str(tmp_path / f"Right_{i}.png"), img_r)
    out = str(tmp_path / "calib.yml")
    rc = main([
        "calibrate", str(tmp_path / "Left_*.png"), str(tmp_path / "Right_*.png"),
        out, "--cols", str(cols), "--rows", str(rows),
    ])
    assert rc == 0
    calib = load_opencv_stereo_yaml(out)
    assert calib.left_intrinsics.shape == (3, 3)
    assert np.isfinite(calib.translation).all()


def test_cli_calibrate_unpaired(tmp_path):
    rc = main([
        "calibrate", str(tmp_path / "none_*.png"), str(tmp_path / "none_*.png"),
        str(tmp_path / "o.yml"),
    ])
    assert rc == 2

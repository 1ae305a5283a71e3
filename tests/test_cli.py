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

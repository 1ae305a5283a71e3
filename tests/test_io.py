"""I/O layer: images, dataset loaders, capture sources; device smoke test.

The smoke test mirrors the reference's ``GPUTest`` SAXPY check
(``BlockMatching/test.cu:35-76``) as a minimal backend sanity gate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_stereo_matching_tpu.io.capture import DirectorySource, PairListSource
from gpu_stereo_matching_tpu.io.images import load_image_bgr, save_image
from gpu_stereo_matching_tpu.io.middlebury import (
    list_middlebury_scenes,
    load_middlebury_scene,
)


def test_saxpy_smoke():
    x = jnp.arange(1 << 12, dtype=jnp.float32)
    y = jnp.ones(1 << 12, jnp.float32)
    out = jax.jit(lambda x, y: 2.0 * x + y)(x, y)
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.arange(1 << 12) + 1.0)


def test_image_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    p = str(tmp_path / "img.png")
    save_image(p, img)
    back = load_image_bgr(p)
    np.testing.assert_array_equal(back, img)


def test_middlebury_listing(reference_images_root):
    names = list_middlebury_scenes(reference_images_root, with_gt_only=True)
    assert "Art" in names and "Reindeer" in names
    scene = load_middlebury_scene(reference_images_root, "Art")
    assert scene.left_bgr.shape == scene.right_bgr.shape
    assert scene.gt_left is not None and scene.gt_left.ndim == 2


def test_directory_source_chess():
    import os

    chess = "/root/reference/Chess/Set1"
    if not os.path.isdir(chess):
        pytest.skip("chess set not available")
    src = DirectorySource(chess)
    assert len(src.pairs) == 8
    left, right = next(src.frames())
    assert left.shape == right.shape and left.shape[2] == 3


def test_pair_list_source(tmp_path, rng):
    img = rng.integers(0, 256, size=(6, 7, 3), dtype=np.uint8)
    lp, rp = str(tmp_path / "l.png"), str(tmp_path / "r.png")
    save_image(lp, img)
    save_image(rp, img)
    frames = list(PairListSource([(lp, rp)]).frames())
    assert len(frames) == 1
    np.testing.assert_array_equal(frames[0][0], frames[0][1])


def test_turbo_colormap_and_colorize(rng):
    from gpu_stereo_matching_tpu.io.visualize import colorize_disparity, turbo_colormap

    ramp = turbo_colormap(np.linspace(0, 1, 16))
    assert ramp.shape == (16, 3) and ramp.dtype == np.uint8
    # Turbo goes blue → red: red channel increases, blue decreases
    assert ramp[-1, 0] > ramp[0, 0] and ramp[0, 2] > ramp[-1, 2]

    disp = rng.integers(0, 64, size=(8, 9)).astype(np.int32)
    disp[0, 0] = 0
    vis = colorize_disparity(disp, max_disparity=64)
    assert vis.shape == (8, 9, 3)
    np.testing.assert_array_equal(vis[0, 0], [0, 0, 0])  # invalid blacked out

"""Input validation for public API boundaries.

The reference never checks an error code (every ``cudaMalloc``/``cudaMemcpy``
return ignored, ``Device.cu:187-214``; file loads unchecked,
``Caller.cpp:12-13``). Here malformed inputs fail fast with actionable
messages before any device work is dispatched.
"""

from __future__ import annotations

from typing import Tuple


def check_gray_pair(left, right, num_disparities: int, what: str = "image") -> None:
    if left.ndim not in (2, 3):
        raise ValueError(
            f"{what}: expected (H, W) or (B, H, W) gray arrays, got {left.shape}"
        )
    if left.shape != right.shape:
        raise ValueError(
            f"{what}: left/right shapes differ: {left.shape} vs {right.shape}"
        )
    if str(left.dtype) != "uint8" or str(right.dtype) != "uint8":
        raise TypeError(
            f"{what}: expected uint8 inputs, got {left.dtype}/{right.dtype}"
        )
    w = left.shape[-1]
    if num_disparities > w:
        raise ValueError(
            f"{what}: num_disparities={num_disparities} exceeds image width {w}"
        )


def check_bgr_pair(left, right, num_disparities: int, what: str = "image") -> None:
    if left.ndim != 3 or left.shape[-1] != 3:
        raise ValueError(f"{what}: expected (H, W, 3) BGR arrays, got {left.shape}")
    if left.shape != right.shape:
        raise ValueError(
            f"{what}: left/right shapes differ: {left.shape} vs {right.shape}"
        )
    if str(left.dtype) != "uint8" or str(right.dtype) != "uint8":
        raise TypeError(
            f"{what}: expected uint8 inputs, got {left.dtype}/{right.dtype}"
        )
    if num_disparities > left.shape[1]:
        raise ValueError(
            f"{what}: max_disp_levels={num_disparities} exceeds width {left.shape[1]}"
        )


def check_maps(map_x, map_y, what: str = "rectification maps") -> Tuple[int, int]:
    if map_x.shape != map_y.shape or map_x.ndim != 2:
        raise ValueError(
            f"{what}: map_x/map_y must be equal-shape 2-D, got "
            f"{map_x.shape} vs {map_y.shape}"
        )
    return map_x.shape

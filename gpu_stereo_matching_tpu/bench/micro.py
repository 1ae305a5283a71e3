"""Micro-benchmarks of individual stages (the reference's pattern).

Mirrors ``cvtColorTest`` — 1000-iteration CPU vs library vs device timing
of gray conversion (``BlockMatching/Caller.cpp:76-112``) — and the timed
remap/upload/download stages of ``blockMatching_gpu``
(``Device.cu:204-292``), generalized into a small registry of stage
benchmarks with structured output.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import numpy as np

import jax
import jax.numpy as jnp


def _time(fn: Callable[[], object], iters: int) -> float:
    fn()  # warm / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None
    return (time.perf_counter() - t0) / iters


def run_micro_benchmarks(
    height: int = 1080, width: int = 1920, iters: int = 100
) -> Dict[str, float]:
    """Per-stage seconds; printed as ms alongside a NumPy host reference."""
    from gpu_stereo_matching_tpu.ops.color import gray_blockmatching_bgr, gradient_x
    from gpu_stereo_matching_tpu.ops.postprocess import median_filter_u8
    from gpu_stereo_matching_tpu.ops.remap import remap_bilinear_u8

    rng = np.random.default_rng(0)
    img_bgr = rng.integers(0, 256, (height, width, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (height, width), dtype=np.uint8)
    map_x = (rng.random((height, width)) * width).astype(np.float32)
    map_y = (rng.random((height, width)) * height).astype(np.float32)

    j_bgr = jnp.asarray(img_bgr)
    j_gray = jnp.asarray(gray)
    j_mx, j_my = jnp.asarray(map_x), jnp.asarray(map_y)

    gray_jit = jax.jit(gray_blockmatching_bgr)
    grad_jit = jax.jit(gradient_x)
    remap_jit = jax.jit(remap_bilinear_u8)
    median_jit = jax.jit(lambda x: median_filter_u8(x, 3))

    results = {
        "gray_cpu_numpy": _time(
            lambda: np.clip(
                np.rint(img_bgr.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)),
                0, 255,
            ).astype(np.uint8),
            max(iters // 10, 1),
        ),
        "gray_tpu": _time(lambda: gray_jit(j_bgr), iters),
        "gradient_tpu": _time(lambda: grad_jit(j_gray), iters),
        "remap_tpu": _time(lambda: remap_jit(j_gray, j_mx, j_my), iters),
        "median7x7_tpu": _time(lambda: median_jit(j_gray), max(iters // 10, 1)),
        "h2d_upload": _time(lambda: jnp.asarray(gray).block_until_ready(), iters),
        "d2h_download": _time(lambda: np.asarray(j_gray), iters),
    }

    # Fused vs split-phase block matching (the reference's finished vs
    # unfinished kernel pair, Device.cu:34-64 vs 67-125): the cost of
    # materializing the SAD volume in HBM. Fenced by a scalar fetch (the
    # tunnel's block_until_ready does not fence).
    from gpu_stereo_matching_tpu.kernels.sad_wta import fused_block_matching
    from gpu_stereo_matching_tpu.kernels.split_phase import (
        split_phase_block_matching,
    )

    j_right = jnp.asarray(
        rng.integers(0, 256, (height, width), dtype=np.uint8)
    )
    num_disp = min(64, width)  # tiny test shapes can't cover 64 disparities
    interpret = jax.default_backend() == "cpu"  # Pallas interpreter off-TPU
    results["bm_fused"] = _time(
        lambda: int(
            jnp.sum(
                fused_block_matching(
                    j_gray, j_right, num_disp, 5, interpret=interpret
                )
            )
        ),
        max(iters // 10, 1),
    )
    results["bm_split_phase"] = _time(
        lambda: int(
            jnp.sum(
                split_phase_block_matching(
                    j_gray, j_right, num_disp, 5, interpret=interpret
                )
            )
        ),
        max(iters // 10, 1),
    )
    # Large-radius median: 255-pass CDF vs the CTMF-analog two-tier
    # histogram Pallas kernel (ctmf.c:98-339), both scalar-fenced.
    from gpu_stereo_matching_tpu.kernels.ctmf_median import ctmf_median_u8

    for r in (5, 7):
        if min(height, width) <= 2 * r:
            continue
        cdf = jax.jit(
            lambda x, r=r: median_filter_u8(x, r, method="histogram")
        )
        ctm = jax.jit(
            lambda x, r=r: ctmf_median_u8(x, r, interpret=interpret)
        )
        results[f"median_r{r}_cdf255"] = _time(
            lambda: int(jnp.sum(cdf(j_gray)[::97, ::97])),
            max(iters // 20, 1),
        )
        results[f"median_r{r}_ctmf_kernel"] = _time(
            lambda: int(jnp.sum(ctm(j_gray)[::97, ::97])),
            max(iters // 20, 1),
        )

    for name, secs in results.items():
        print(f"{name:24s} {secs * 1e3:9.3f} ms")
    return results


if __name__ == "__main__":
    run_micro_benchmarks()

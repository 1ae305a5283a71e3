"""Pipelined segment-tree video processing.

Per-frame ST-1 has a host stage (C++ weights/median → FH spanning tree →
HPD plan, ~65 ms at Middlebury size since the native providers and plan
core landed) and a device stage (cost → tree filter → WTA → median, one
fused dispatch). Sequentially they serialize; this pipeline overlaps
them — the software-pipelining analog of the reference's absent streaming
mode (SURVEY §2.5 "PP analog"):

    stage A (host):          build weights + tree + plan for frame i+1
    stage B (device, async): fused disparity dispatch for frame i
    stage C (host):          fetch disparity i-1

JAX's async dispatch provides the concurrency — the host builds frame
i+1's tree while the device crunches frame i, because frame i's dispatch
was queued before the build starts.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from gpu_stereo_matching_tpu.core.config import SegmentTreeConfig
from gpu_stereo_matching_tpu.models.segment_tree import _scale_u8, _st1_device_jit
from gpu_stereo_matching_tpu.tree.builder import build_segment_tree, color_edge_weights
from gpu_stereo_matching_tpu.tree.hpd import HeavyPathPlan


class SegmentTreeVideoPipeline:
    """Streaming ST-1 over an iterator of (left_bgr, right_bgr) frames."""

    def __init__(self, config: SegmentTreeConfig = SegmentTreeConfig()) -> None:
        self.config = config

    def _host_build(self, left_bgr: np.ndarray) -> HeavyPathPlan:
        cfg = self.config
        h, w = left_bgr.shape[:2]
        weights = color_edge_weights(left_bgr)
        tree = build_segment_tree(
            weights, h, w,
            tau=cfg.tau, min_size=cfg.min_size_seg,
            penalty=cfg.penalty_cross_seg, weight_scale=1.0,
        )
        return HeavyPathPlan.from_tree(tree, cfg.sigma)

    def process(
        self, frames: Iterable[Tuple[np.ndarray, np.ndarray]]
    ) -> Iterator[np.ndarray]:
        """Yield scaled uint8 disparity maps, one per input frame pair."""
        cfg = self.config
        pending: Optional[jnp.ndarray] = None  # device result for frame i-1

        it = iter(frames)
        try:
            cur = next(it)
        except StopIteration:
            return
        cur_plan = self._host_build(cur[0])

        while cur is not None:
            nxt = next(it, None)
            # Queue the big dispatch for the current frame (async).
            out = _st1_device_jit(
                jnp.asarray(cur[0]), jnp.asarray(cur[1]), cur_plan,
                cfg.max_disp_levels,
            )
            # While the device runs, do the next frame's host-side build.
            nxt_plan = self._host_build(nxt[0]) if nxt is not None else None
            # Drain the previous frame's result.
            if pending is not None:
                yield _scale_u8(np.asarray(pending), cfg.disparity_scale)
            pending = out
            cur, cur_plan = nxt, nxt_plan

        if pending is not None:
            yield _scale_u8(np.asarray(pending), cfg.disparity_scale)

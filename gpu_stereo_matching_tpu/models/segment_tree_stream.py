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
from gpu_stereo_matching_tpu.models.segment_tree import (
    _scale_u8,
    _st1_device_group_jit,
    _st1_device_jit,
)
from gpu_stereo_matching_tpu.tree.builder import build_segment_tree, color_edge_weights
from gpu_stereo_matching_tpu.tree.stride import StridePlan, stack_stride_plans


class SegmentTreeVideoPipeline:
    """Streaming ST-1 over an iterator of (left_bgr, right_bgr) frames."""

    def __init__(self, config: SegmentTreeConfig = SegmentTreeConfig()) -> None:
        self.config = config

    def _host_build(self, left_bgr: np.ndarray) -> StridePlan:
        cfg = self.config
        h, w = left_bgr.shape[:2]
        weights = color_edge_weights(left_bgr)
        tree = build_segment_tree(
            weights, h, w,
            tau=cfg.tau, min_size=cfg.min_size_seg,
            penalty=cfg.penalty_cross_seg, weight_scale=1.0,
        )
        return StridePlan.from_tree(tree, cfg.sigma)

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


class SegmentTreeBatchPipeline:
    """Batched streaming ST-1: G frames per device dispatch.

    Per-frame ST dispatches pay a fixed tunnel/dispatch round trip that
    caps throughput regardless of kernel speed; batching G frames into one
    vmapped dispatch amortizes it.  Host tree builds (C++ via ctypes —
    the GIL is released during the calls) run on a small thread pool and
    are overlapped with the device dispatch of the previous group, same
    software-pipelining scheme as :class:`SegmentTreeVideoPipeline`.

    Output order and values match the per-frame pipeline (the plan-order
    filter is bit-identical single vs batched).
    """

    def __init__(
        self,
        config: SegmentTreeConfig = SegmentTreeConfig(),
        group_size: int = 8,
        workers: int = 2,
    ) -> None:
        if group_size < 1:
            raise ValueError("group_size must be >= 1")
        self.config = config
        self.group_size = group_size
        self.workers = workers

    def _build_plan(self, left_bgr: np.ndarray) -> StridePlan:
        cfg = self.config
        h, w = left_bgr.shape[:2]
        weights = color_edge_weights(left_bgr)
        tree = build_segment_tree(
            weights, h, w,
            tau=cfg.tau, min_size=cfg.min_size_seg,
            penalty=cfg.penalty_cross_seg, weight_scale=1.0,
        )
        # Host-side arrays: the group ships as ONE stacked plan upload.
        return StridePlan.from_tree(tree, cfg.sigma, device=False)

    def _host_build_group(self, group, pool) -> Tuple[np.ndarray, np.ndarray, StridePlan, int]:
        """Stack a (possibly short) group; pad by repeating the last frame."""
        n_real = len(group)
        g = self.group_size
        padded = list(group) + [group[-1]] * (g - n_real)
        lefts = np.stack([f[0] for f in padded])
        rights = np.stack([f[1] for f in padded])
        plans = list(pool.map(self._build_plan, [f[0] for f in padded]))
        # Converge layouts to a fixed point (the registry is monotone, but
        # a build can grow it — see tree.hpd.converged_plan_batch).
        for _ in range(8):
            if len({p.layout_key for p in plans}) == 1:
                break
            plans = list(pool.map(self._build_plan, [f[0] for f in padded]))
        return lefts, rights, stack_stride_plans(plans), n_real

    def process(
        self, frames: Iterable[Tuple[np.ndarray, np.ndarray]]
    ) -> Iterator[np.ndarray]:
        """Yield scaled uint8 disparity maps, one per input frame pair."""
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.config
        g = self.group_size

        def chunks(it):
            buf = []
            for f in it:
                buf.append(f)
                if len(buf) == g:
                    yield buf
                    buf = []
            if buf:
                yield buf

        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            it = chunks(iter(frames))
            cur = next(it, None)
            if cur is None:
                return
            cur_host = self._host_build_group(cur, pool)
            pending = None  # (device array, n_real) for group i-1

            while cur_host is not None:
                lefts, rights, plans, n_real = cur_host
                out = _st1_device_group_jit(
                    jnp.asarray(lefts), jnp.asarray(rights), plans,
                    cfg.max_disp_levels,
                )
                # Overlap: next group's host build runs while the device
                # crunches the current group (async dispatch above).
                nxt = next(it, None)
                nxt_host = (
                    self._host_build_group(nxt, pool) if nxt is not None
                    else None
                )
                if pending is not None:
                    arr, k = pending
                    for row in np.asarray(arr)[:k]:
                        yield _scale_u8(row, cfg.disparity_scale)
                pending = (out, n_real)
                cur_host = nxt_host

            arr, k = pending
            for row in np.asarray(arr)[:k]:
                yield _scale_u8(row, cfg.disparity_scale)

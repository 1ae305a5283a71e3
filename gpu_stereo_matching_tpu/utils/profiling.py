"""Structured per-stage timing and frame metrics.

The reference instruments with ad-hoc stdout timers — ``clock()`` deltas on
the CPU (``BlockMatching.cpp:25-32``) and cudaEvent pairs around upload /
pre-calc / find-corr / download (``Device.cu:204-218,226-292``). Here the
equivalents are first-class:

* :class:`StageTimer` — wall-clock stage spans with ``block_until_ready``
  fencing (the cudaEventSynchronize analog for XLA's async dispatch), with
  a structured dict/JSON view instead of free text,
* :class:`FrameMetrics` — the per-frame record (fps, per-stage ms, bad-2.0
  when GT is present) that the bench harness and streaming rig emit,
* :func:`trace` — context manager bridging to ``jax.profiler`` traces for
  deep dives (the profiler integration the reference lacked).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Dict, List, Optional

import jax


@dataclasses.dataclass
class StageSpan:
    name: str
    seconds: float


class StageTimer:
    """Accumulates named stage timings; device work is fenced per stage."""

    def __init__(self) -> None:
        self.spans: List[StageSpan] = []

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        """Time a stage. ``fence`` (array or pytree) is blocked on before
        the span closes so async-dispatched device work is attributed to
        the stage that launched it."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            self.spans.append(StageSpan(name, time.perf_counter() - t0))

    def record(self, name: str, seconds: float) -> None:
        self.spans.append(StageSpan(name, seconds))

    @property
    def total_seconds(self) -> float:
        return sum(s.seconds for s in self.spans)

    def as_dict(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for s in self.spans:
            out[s.name] = out.get(s.name, 0.0) + s.seconds
        return out

    def summary(self) -> str:
        parts = [f"{s.name}={s.seconds * 1e3:.2f}ms" for s in self.spans]
        return " ".join(parts) + f" total={self.total_seconds * 1e3:.2f}ms"


@dataclasses.dataclass
class FrameMetrics:
    """Structured per-frame observability record."""

    pipeline: str
    height: int
    width: int
    num_disparities: int
    stage_ms: Dict[str, float]
    fps: Optional[float] = None
    bad2: Optional[float] = None

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context for TensorBoard-compatible dumps."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

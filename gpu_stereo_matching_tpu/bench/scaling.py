"""Scaling-efficiency harness: fps vs. mesh size (BASELINE config 5).

Measures the sharded block-matching step over a sequence of mesh
factorizations (data / space / disp) and reports throughput and
efficiency against the single-device run. On real pods this is launched
per host via :mod:`parallel.launch`; in tests it runs on the virtual CPU
mesh (functional scaling only — CPU fps is not meaningful for the
hardware targets).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from gpu_stereo_matching_tpu.core.config import BlockMatchingConfig, MeshConfig
from gpu_stereo_matching_tpu.parallel.mesh import build_mesh
from gpu_stereo_matching_tpu.parallel.stereo import (
    make_sharded_block_matching,
    shard_batch,
)


@dataclasses.dataclass
class ScalingPoint:
    mesh: dict
    devices: int
    fps: float
    efficiency: Optional[float]  # vs the 1-device point, per device


def _measure(mesh_cfg: MeshConfig, bm: BlockMatchingConfig, num_frames, h, w) -> float:
    mesh = build_mesh(mesh_cfg)
    step = make_sharded_block_matching(mesh, bm)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.integers(0, 256, (num_frames, h, w), dtype=np.uint8))
    right = jnp.asarray(rng.integers(0, 256, (num_frames, h, w), dtype=np.uint8))
    jl, jr = shard_batch(mesh, left, right)
    step(jl, jr).block_until_ready()  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        step(jl, jr).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return num_frames / best


def run_scaling_benchmark(
    full_mesh: MeshConfig,
    bm: BlockMatchingConfig = BlockMatchingConfig(),
    num_frames: int = 16,
    height: int = 1080,
    width: int = 1920,
) -> List[ScalingPoint]:
    """Sweep 1 device → full mesh along the data axis; print JSON lines."""
    points: List[ScalingPoint] = []
    base_fps = None
    data = 1
    while data <= full_mesh.data:
        cfg = MeshConfig(data=data, space=full_mesh.space, disp=full_mesh.disp)
        frames = max(num_frames, cfg.num_devices)
        frames -= frames % cfg.num_devices or 0
        fps = _measure(cfg, bm, max(frames, cfg.data), height, width)
        eff = None
        if base_fps is None:
            base_fps = fps / cfg.num_devices
        else:
            eff = fps / (cfg.num_devices * base_fps)
        pt = ScalingPoint(
            mesh=dict(zip(cfg.axis_names, cfg.shape)),
            devices=cfg.num_devices,
            fps=round(fps, 2),
            efficiency=None if eff is None else round(eff, 3),
        )
        points.append(pt)
        print(json.dumps(dataclasses.asdict(pt)))
        data *= 2
    return points

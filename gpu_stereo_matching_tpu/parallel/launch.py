"""Multi-host launch glue.

There is no hand-written transport (the reference has none either — its
only parallelism is single-GPU SIMT): multi-host runs use JAX's built-in
distributed runtime; XLA compiles every collective in the sharded pipeline
(halo ``ppermute``, WTA ``pmin``) onto ICI within a slice and DCN across
hosts.

Typical SPMD launch — the same script on every host:

    python -m gpu_stereo_matching_tpu.parallel.launch \
        --coordinator 10.0.0.1:8476 --num-processes 4 --process-id $ID

or rely on TPU-pod auto-detection with no arguments.
"""

from __future__ import annotations

import argparse
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime (auto-detects on TPU pods)."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--data", type=int, default=None, help="mesh data axis (default: all devices)")
    p.add_argument("--space", type=int, default=1)
    p.add_argument("--disp", type=int, default=1)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    args = p.parse_args(argv)

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    import jax

    from gpu_stereo_matching_tpu.bench.scaling import run_scaling_benchmark
    from gpu_stereo_matching_tpu.core.config import MeshConfig

    n_dev = len(jax.devices())
    data = args.data or n_dev // (args.space * args.disp)
    cfg = MeshConfig(data=data, space=args.space, disp=args.disp)
    run_scaling_benchmark(
        cfg, num_frames=args.frames, height=args.height, width=args.width
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

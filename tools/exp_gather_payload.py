"""Round-5 experiment: does XLA's row-gather cost have a bytes component?
(VERDICT r4 weak #4 / next-round task 6.)

The stride ST filter is gather-overhead-bound: ~17 ns per gathered row vs
0.3 ns at HBM peak, and the config-3 finding (128-disparity rows cost only
41% more than 60) says the cost is per ROW, not per byte. The proposed
lever was bf16-packing two D-channels per f32 lane. This tool pins down
whether that can work by sweeping, at fixed row count and at fixed total
payload, the gathered row WIDTH and dtype on the real chip:

  w64_f32    baseline: the filter's actual shape (~N rows x 64 f32)
  w32_f32    half the bytes per row (what bf16 packing would produce)
  w128_f32   double bytes per row (the config-3 shape)
  w64_bf16   same lanes, half bytes
  rows/2 x 128  SAME total payload in HALF the rows — the hypothetical
                ceiling IF tree positions could be gathered pairwise
                (they cannot: gather indices are arbitrary tree
                positions; this bounds what pairing could ever buy)

All gathers fetch the same number of elements from a table sized like an
Art-frame plan (~300k rows), scalar-fenced, best of reps. ns/row decides:
flat across widths => per-row latency floor, bf16 packing buys nothing,
and the filter is latency-bound speed-of-light for XLA-level gathers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_gather_payload.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(table_rows: int = 300_000, gather_rows: int = 262_144,
         reps: int = 5):
    import jax
    import jax.numpy as jnp

    from gpu_stereo_matching_tpu.utils.cache import enable_jit_cache

    enable_jit_cache()
    rng = np.random.default_rng(0)
    idx_full = rng.integers(0, table_rows, gather_rows).astype(np.int32)
    idx_half = idx_full[: gather_rows // 2]

    cases = [
        ("w64_f32", 64, jnp.float32, idx_full, False),
        ("w32_f32", 32, jnp.float32, idx_full, False),
        ("w128_f32", 128, jnp.float32, idx_full, False),
        ("w64_bf16", 64, jnp.bfloat16, idx_full, False),
        ("w128_bf16", 128, jnp.bfloat16, idx_full, False),
        ("w16_u16", 16, jnp.uint16, idx_full, False),
        ("half_rows_w128_f32", 128, jnp.float32, idx_half, False),
        # The transform the filter could actually use: keep f32 data,
        # gather THROUGH a bitcast u16 view, bitcast back — exact.
        ("w64_f32_via_u16_view", 64, jnp.float32, idx_full, True),
    ]

    out = {"table_rows": table_rows, "gather_rows": gather_rows}
    for name, width, dt, idx, via_view in cases:
        table = jnp.asarray(
            rng.random((table_rows, width), np.float32), dt
        )
        jidx = jnp.asarray(idx)

        def make_run(n_rounds):
            @jax.jit
            def run(t, i):
                # Dependent gathers (the +cast feeds round k's index from
                # round k-1's value — no CSE/hoisting); the tunnel round
                # trip cancels in the two-size difference below.
                if via_view:
                    t = jax.lax.bitcast_convert_type(
                        t, jnp.uint16
                    ).reshape(t.shape[0], -1)
                acc = jnp.zeros((), jnp.float32)
                for _ in range(n_rounds):
                    g = t[i]
                    if via_view:
                        g = jax.lax.bitcast_convert_type(
                            g.reshape(g.shape[0], -1, 2), jnp.float32
                        )
                    acc = acc + jnp.sum(g[:1, :1, ...].astype(jnp.float32))
                    i = (i + (acc.astype(jnp.int32) & 1)) % t.shape[0]
                return acc

            return run

        run8, run16 = make_run(8), make_run(16)

        def best_of(run):
            float(run(table, jidx))  # compile + warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(run(table, jidx))
                best = min(best, time.perf_counter() - t0)
            return best

        # (t16 - t8)/8 cancels the fixed dispatch/tunnel cost exactly.
        per_gather_s = (best_of(run16) - best_of(run8)) / 8
        out[name] = {
            "ms_per_gather": round(per_gather_s * 1e3, 3),
            "ns_per_row": round(per_gather_s / len(idx) * 1e9, 2),
            "bytes_per_row": width * jnp.dtype(dt).itemsize,
        }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    import sys

    # Optional: table_rows gather_rows (e.g. 1500000 1048576 for the HD
    # sweep — which showed f32 still ~10 ns/row and the bf16 advantage
    # GONE at large tables; see ROADMAP round-5 notes).
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)

"""Ring halo exchange for spatially tiled window operations.

The structural analog of ring-attention/context-parallel neighbor exchange
(SURVEY §5): window ops (SAD aggregation, median) on an H-sharded image
need ``radius`` rows from each spatial neighbor. Implemented with two
``lax.ppermute`` shifts over the ``space`` mesh axis inside ``shard_map``;
global image borders receive zeros, which reproduces the single-device
clipped-window ("boundary skip") semantics exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def extend_with_row_halos(x: jnp.ndarray, radius: int, axis_name: str) -> jnp.ndarray:
    """Return ``x`` extended with ``radius`` rows from each ring neighbor.

    ``x``: (..., H_local, W) shard inside ``shard_map``. Output has
    ``H_local + 2·radius`` rows; at the global top/bottom the halo rows are
    zeros (clipped-window semantics).
    """
    if radius <= 0:
        return x
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    bottom_rows = x[..., -radius:, :]
    top_rows = x[..., :radius, :]

    if n == 1:
        from_prev = jnp.zeros_like(bottom_rows)
        from_next = jnp.zeros_like(top_rows)
    else:
        # shift "down": shard i sends its bottom rows to shard i+1
        from_prev = lax.ppermute(
            bottom_rows, axis_name, [(i, (i + 1) % n) for i in range(n)]
        )
        # shift "up": shard i sends its top rows to shard i-1
        from_next = lax.ppermute(
            top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
    # Zero the wrapped halos at the global image borders.
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=-2)

"""Winner-take-all disparity selection.

The reference fuses WTA into its SAD kernel with a serial argmin over d
(``BlockMatching/Device.cu:56-63``) and implements it standalone for the
segment-tree pipeline (``STMatching/StereoHelper.cpp:131-154``). Here it is
an axis reduction over the leading disparity axis; ties resolve to the
smallest disparity (both reference loops use strict ``<`` on an ascending
scan, which keeps the first/lowest-d minimum).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def wta_disparity(cost: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Argmin over the disparity axis of a (D, ..., H, W) volume → int32."""
    return jnp.argmin(cost, axis=axis).astype(jnp.int32)


def wta_with_cost(cost: jnp.ndarray, axis: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Argmin and the winning cost (useful for sharded-D reductions)."""
    disp = jnp.argmin(cost, axis=axis).astype(jnp.int32)
    best = jnp.min(cost, axis=axis)
    return disp, best

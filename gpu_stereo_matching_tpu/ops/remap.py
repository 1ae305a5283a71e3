"""Bilinear remap (undistort + rectify resampling) as an XLA gather.

Matches the reference GPU semantics (``BlockMatching/Device.cu:127-167``):
``dst(y, x) = bilinear(src, map_y(y,x), map_x(y,x))``, returning 0 whenever
any of the four interpolation neighbors falls outside the image (strict:
coordinates exactly on the last row/column also produce 0, as in
``BilinearInterpolation``'s ``x2 >= rows || y2 >= cols`` guard), with a
round-to-nearest-even saturating uint8 cast (``cvt.rni.sat.u8.f32``).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_stereo_matching_tpu.ops.color import round_sat_u8


def remap_bilinear_u8(
    src: jnp.ndarray,
    map_x: jnp.ndarray,
    map_y: jnp.ndarray,
) -> jnp.ndarray:
    """Remap a (H, W) uint8 image through float32 coordinate maps.

    ``map_x``/``map_y`` give, for every destination pixel, the source column
    and row to sample. Output has the maps' shape.
    """
    h, w = src.shape[-2], src.shape[-1]
    x0f = jnp.floor(map_x)
    y0f = jnp.floor(map_y)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    valid = (x0 >= 0) & (y0 >= 0) & (x0 + 1 <= w - 1) & (y0 + 1 <= h - 1)

    x0c = jnp.clip(x0, 0, w - 2)
    y0c = jnp.clip(y0, 0, h - 2)
    flat = src.reshape(src.shape[:-2] + (h * w,)).astype(jnp.float32)
    base = y0c * w + x0c

    q11 = jnp.take(flat, base, axis=-1)
    q12 = jnp.take(flat, base + 1, axis=-1)
    q21 = jnp.take(flat, base + w, axis=-1)
    q22 = jnp.take(flat, base + w + 1, axis=-1)

    fx = map_x - x0f
    fy = map_y - y0f
    top = (1.0 - fy) * ((1.0 - fx) * q11 + fx * q12)
    bot = fy * ((1.0 - fx) * q21 + fx * q22)
    out = jnp.where(valid, top + bot, 0.0)
    return round_sat_u8(out)

"""Fused Pallas kernel: AD cost + SAD box aggregation + WTA argmin.

This replaces the reference's two-kernel hot path — ``kernalPreCal_V2``
(per-(pixel, d) abs-diff volume, ``BlockMatching/Device.cu:19-32``) and
``kernalFindCorr`` (per-pixel O(d·w²) window loop + argmin,
``Device.cu:34-64``) — with a single TPU kernel that never materializes the
cost volume in HBM:

* the image is processed in row tiles; each grid step DMAs a
  ``TILE_H + 2r`` row slab of both (pre-padded) images HBM→VMEM,
* for each disparity (statically unrolled), the shifted abs-diff slab is
  reduced with separable shifted-add box sums (2·(2r+1) vector adds — the
  O(1)-per-pixel formulation instead of the reference's O(w²) loop),
* a running (min, argmin) pair is kept in vector registers; ties resolve to
  the smallest d, matching the reference's strict ``<`` update,
* out-of-range columns (x < d) cost 255 per pixel, matching the reference's
  out-of-range convention (``BlockMatching.cpp:208-212``).

Zero row padding on the host reproduces the clipped-window "boundary skip"
semantics exactly (padded diffs are 0); horizontal clipping is done with
zero-extended shifted adds inside the kernel. Results are bit-identical to
``ops.ad_cost_volume`` → ``ops.aggregate_cost_volume`` → ``ops.wta_disparity``
(all sums are integers < 2²⁴, exact in f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    left_hbm,      # (Hp + 2r, W) u8 in ANY/HBM; Hp = padded H (multiple of tile)
    right_hbm,     # (Hp + 2r, W + D) u8, D zero columns on the left
    disp_out,      # (TILE_H, W) i32 VMEM block
    lbuf,          # (TILE_H + 2r, W) u8 VMEM scratch
    rbuf,          # (TILE_H + 2r, W + D) u8 VMEM scratch
    sems,          # 2 DMA semaphores
    *,
    num_disparities: int,
    radius: int,
    tile_h: int,
    invalid_cost: float,
):
    i = pl.program_id(0)
    r = radius
    halo_rows = tile_h + 2 * r
    w = disp_out.shape[1]

    row0 = i * tile_h
    cp_l = pltpu.make_async_copy(
        left_hbm.at[pl.ds(row0, halo_rows), :], lbuf, sems.at[0]
    )
    cp_r = pltpu.make_async_copy(
        right_hbm.at[pl.ds(row0, halo_rows), :], rbuf, sems.at[1]
    )
    cp_l.start()
    cp_r.start()
    cp_l.wait()
    cp_r.wait()

    lf = lbuf[:].astype(jnp.float32)           # (halo, W)
    rf = rbuf[:].astype(jnp.float32)           # (halo, W + D)
    col = jax.lax.broadcasted_iota(jnp.int32, (halo_rows, w), dimension=1)

    best = jnp.full((tile_h, w), jnp.inf, jnp.float32)
    best_d = jnp.zeros((tile_h, w), jnp.int32)

    for d in range(num_disparities):
        shifted = rf[:, num_disparities - d : num_disparities - d + w]
        diff = jnp.abs(lf - shifted)
        if d > 0:
            diff = jnp.where(col < d, invalid_cost, diff)
        # Vertical box: sum of 2r+1 row-shifted slabs → (tile_h, W).
        vsum = diff[0:tile_h, :]
        for j in range(1, 2 * r + 1):
            vsum = vsum + diff[j : j + tile_h, :]
        # Horizontal box with zero-extension (clipped-window semantics).
        hp = jnp.pad(vsum, ((0, 0), (r, r)))
        sad = hp[:, 0:w]
        for j in range(1, 2 * r + 1):
            sad = sad + hp[:, j : j + w]
        upd = sad < best
        best = jnp.where(upd, sad, best)
        best_d = jnp.where(upd, d, best_d)

    disp_out[:, :] = best_d


@functools.partial(
    jax.jit,
    static_argnames=("num_disparities", "radius", "tile_h", "interpret"),
)
def fused_block_matching(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    num_disparities: int = 64,
    radius: int = 5,
    tile_h: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused disparity of a (H, W) uint8 pair → (H, W) int32.

    Bit-exact with the unfused XLA ops path; ``interpret=True`` runs the
    Pallas interpreter (the CPU-test / "sanitizer" mode).
    """
    h, w = left_gray.shape
    r = radius
    num_tiles = -(-h // tile_h)
    hp = num_tiles * tile_h

    left_p = jnp.zeros((hp + 2 * r, w), jnp.uint8)
    left_p = jax.lax.dynamic_update_slice(left_p, left_gray, (r, 0))
    right_p = jnp.zeros((hp + 2 * r, w + num_disparities), jnp.uint8)
    right_p = jax.lax.dynamic_update_slice(right_p, right_gray, (r, num_disparities))

    kernel = functools.partial(
        _kernel,
        num_disparities=num_disparities,
        radius=r,
        tile_h=tile_h,
        invalid_cost=255.0,
    )
    disp = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * r, w), jnp.uint8),
            pltpu.VMEM((tile_h + 2 * r, w + num_disparities), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(left_p, right_p)
    return disp[:h]

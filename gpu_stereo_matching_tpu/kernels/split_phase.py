"""Split-phase Pallas block matching: materialized SAD volume + argmin pass.

The reference sketched this two-kernel variant and never finished it:
``kernalFindAllSAD`` fills a full (H, W, D) SAD volume
(``BlockMatching/Device.cu:67-97``) and ``kernalFindMinSAD`` was meant to
tree-reduce it per pixel but never updates ``matchedPos`` — it always
writes 0 (``Device.cu:99-125``) and the whole path is commented out
(``Device.cu:259-279``). This module is the *correct* TPU-native
completion (SURVEY §2.4 row 3):

* **Phase 1** (:func:`sad_volume`): one Pallas kernel over a
  (row-tile, disparity) grid materializes the (D, H, W) int32 SAD volume
  in HBM. The image slab is DMA'd once per row tile (the grid's minor
  axis is d, and TPU grids run sequentially, so the VMEM scratch persists
  across the d sweep); per (tile, d) the clipped-window SAD map is the
  same doubling sliding-sum evaluation the fused kernel uses — bit-exact
  with ``ops.aggregate_cost_volume(ops.ad_cost_volume(...))``.
* **Phase 2** (:func:`wta_from_sad`): a second Pallas kernel reduces the
  volume per row tile with a packed-key min over the d axis
  (``key = SAD·D + d``), so ties resolve to the smallest disparity —
  the semantics ``kernalFindMinSAD`` was trying for.

The fused kernel (``kernels/sad_wta.py``) is the production path — it
never touches HBM with the volume. The split-phase variant exists for
parity with the reference's architecture and for workloads that *want*
the volume (cost-volume filtering, debugging); the micro-bench records
the cost of materialization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_stereo_matching_tpu.kernels.sad_wta import _sad_one_disparity


def _sad_volume_kernel(
    left_hbm, right_hbm, sad_out, lbuf, rbuf, sems, *,
    radius: int, tile_h: int, true_width: int, true_height: int,
    invalid_cost: int,
):
    i = pl.program_id(0)   # row tile (major: slab reused across d)
    d = pl.program_id(1)   # disparity (minor, fastest)
    r = radius
    halo_rows = tile_h + 2 * r
    slab_rows = lbuf.shape[0]
    wp = sad_out.shape[2]

    @pl.when(d == 0)
    def _():
        row0 = i * tile_h
        cp_l = pltpu.make_async_copy(
            left_hbm.at[pl.ds(row0, slab_rows), :], lbuf, sems.at[0]
        )
        cp_r = pltpu.make_async_copy(
            right_hbm.at[pl.ds(row0, slab_rows), :], rbuf, sems.at[1]
        )
        cp_l.start()
        cp_r.start()
        cp_l.wait()
        cp_r.wait()

    lf = lbuf[0:halo_rows, :].astype(jnp.int32)
    rf32 = rbuf[0:halo_rows, :].astype(jnp.int32)
    col_t = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wp), dimension=1)
    # Clipped vertical window size per row (global top/bottom edges).
    gy = i * tile_h + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, 1), dimension=0
    )
    counts = (
        jnp.minimum(gy, r)
        + jnp.minimum(jnp.maximum(true_height - 1 - gy, 0), r)
        + 1
    )
    sad_out[0, :, :] = _sad_one_disparity(
        lf, rf32, col_t, d,
        radius=r, tile_h=tile_h, wp=wp,
        true_width=true_width, invalid_cost=invalid_cost,
        row_counts=counts,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_disparities", "radius", "tile_h", "interpret"),
)
def sad_volume(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    num_disparities: int = 64,
    radius: int = 5,
    tile_h: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, W) uint8 pair → (D, H, W) int32 clipped-window SAD volume.

    Bit-exact with ``aggregate_cost_volume(ad_cost_volume(l, r, D), r)``.
    """
    from gpu_stereo_matching_tpu.core.validation import check_gray_pair

    check_gray_pair(left_gray, right_gray, num_disparities, "sad_volume")
    h, w = left_gray.shape
    r = radius
    num_tiles = -(-h // tile_h)
    hp = num_tiles * tile_h
    slab_rows = -(-(tile_h + 2 * r) // 8) * 8
    total_rows = max((num_tiles - 1) * tile_h + slab_rows, hp + 2 * r)
    wp = -(-w // 128) * 128

    left_p = jnp.zeros((total_rows, wp), jnp.uint8)
    left_p = jax.lax.dynamic_update_slice(left_p, left_gray, (r, 0))
    right_p = jnp.zeros((total_rows, wp), jnp.uint8)
    right_p = jax.lax.dynamic_update_slice(right_p, right_gray, (r, 0))

    kernel = functools.partial(
        _sad_volume_kernel,
        radius=r, tile_h=tile_h, true_width=w, true_height=h,
        invalid_cost=255,
    )
    sad = pl.pallas_call(
        kernel,
        grid=(num_tiles, num_disparities),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, wp), lambda i, d: (d, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_disparities, hp, wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, wp), jnp.uint8),
            pltpu.VMEM((slab_rows, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(left_p, right_p)
    return sad[:, :h, :w]


def _wta_kernel(sad_ref, disp_out, *, num_disparities: int):
    # sad_ref: (D, tile_h, wp) int32 block; packed-key min over d.
    d_ids = jax.lax.broadcasted_iota(
        jnp.int32, sad_ref.shape, dimension=0
    )
    key = sad_ref[:, :, :] * num_disparities + d_ids
    best = jnp.min(key, axis=0)
    disp_out[:, :] = jax.lax.rem(best, num_disparities)


@functools.partial(
    jax.jit, static_argnames=("tile_h", "interpret")
)
def wta_from_sad(
    sad: jnp.ndarray, tile_h: int = 8, interpret: bool = False
) -> jnp.ndarray:
    """(D, H, W) int32 SAD volume → (H, W) int32 argmin disparity.

    The finished analog of ``kernalFindMinSAD`` (``Device.cu:99-125``,
    which never writes the argmin): a packed-key min keeps (SAD, d)
    together through the reduction, ties to the smallest d.
    """
    num_d, h, w = sad.shape
    num_tiles = -(-h // tile_h)
    hp = num_tiles * tile_h
    wp = -(-w // 128) * 128
    sad_p = jnp.full(
        (num_d, hp, wp), jnp.int32(jnp.iinfo(jnp.int32).max // (2 * num_d)),
        jnp.int32,
    )
    sad_p = jax.lax.dynamic_update_slice(sad_p, sad, (0, 0, 0))
    kernel = functools.partial(_wta_kernel, num_disparities=num_d)
    disp = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (num_d, tile_h, wp), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(sad_p)
    return disp[:h, :w]


def split_phase_block_matching(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    num_disparities: int = 64,
    radius: int = 5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Two-dispatch disparity: materialize the SAD volume, then reduce.

    Bit-identical to ``fused_block_matching`` (and to the XLA ops path).
    """
    sad = sad_volume(
        left_gray, right_gray, num_disparities, radius, interpret=interpret
    )
    return wta_from_sad(sad, interpret=interpret)

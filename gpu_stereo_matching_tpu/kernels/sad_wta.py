"""Fused Pallas kernel: AD cost + SAD box aggregation + WTA argmin.

This replaces the reference's two-kernel hot path — ``kernalPreCal_V2``
(per-(pixel, d) abs-diff volume, ``BlockMatching/Device.cu:19-32``) and
``kernalFindCorr`` (per-pixel O(d·w²) window loop + argmin,
``Device.cu:34-64``) — with a single TPU kernel that never materializes the
cost volume in HBM:

* the image is processed in row tiles; each grid step DMAs a row slab of
  both (pre-padded) images HBM→VMEM,
* a ``fori_loop`` over disparities rotates the right slab along lanes
  (``tpu.dynamic_rotate``) and reduces the abs-diff slab with separable
  doubling sliding-window sums — ~2·log₂(2r+1) shifted adds per axis per
  disparity (5 for 11-wide windows) instead of the reference's O(w²)
  per-pixel loop,
* a running (min, argmin) pair is kept in registers; ties resolve to the
  smallest d, matching the reference's strict ``<`` update,
* columns ``x < d`` cost 255 per pixel, matching the reference's
  out-of-range convention (``BlockMatching.cpp:208-212``); columns past the
  true width (lane padding) are forced to 0 so clipped-window sums are
  reproduced exactly.

All arithmetic is int32 (exact; Mosaic also lacks a direct u8→f32 cast).
Zero row padding on the host reproduces the clipped-window "boundary skip"
semantics (padded diffs are 0). Results are bit-identical to
``ops.ad_cost_volume`` → ``ops.aggregate_cost_volume`` → ``ops.wta_disparity``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu




def _sliding_sum(arr, k: int, axis: int):
    """Length-k sliding window sum along ``axis`` by binary doubling.

    out[i] = Σ arr[i : i+k]; uses ~2·⌈log₂k⌉ shifted adds instead of k-1
    (k=11: 5 adds vs 10). Output length is ``arr.shape[axis] - k + 1``.
    """

    def window(x, ofs, length=None):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(ofs, None if length is None else ofs + length)
        return x[tuple(idx)]

    # power[j] holds sliding sums of length 2^j
    power = [arr]
    span = 1
    while span * 2 <= k:
        prev = power[-1]
        keep = prev.shape[axis] - span
        power.append(window(prev, 0, keep) + window(prev, span))
        span *= 2

    out, offset, remaining = None, 0, k
    for j in range(len(power) - 1, -1, -1):
        blk = 1 << j
        if remaining >= blk:
            term = window(power[j], offset)
            if out is None:
                out = term
            else:
                out = window(out, 0, term.shape[axis]) + term
            offset += blk
            remaining -= blk
    return out


def _kernel(
    left_hbm,      # (rows, Wp) u8; r zero rows on top, zero lane padding
    right_hbm,     # (rows, Wp) u8, same layout
    disp_out,      # (TILE_H, Wp) i32 VMEM block
    lbuf,          # (slab, Wp) u8 VMEM scratch
    rbuf,          # (slab, Wp) u8 VMEM scratch
    sems,          # 2 DMA semaphores
    *,
    num_disparities: int,
    radius: int,
    tile_h: int,
    true_width: int,
    invalid_cost: int,
):
    i = pl.program_id(0)
    r = radius
    halo_rows = tile_h + 2 * r
    slab_rows = lbuf.shape[0]
    wp = disp_out.shape[1]

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

    # 32-bit integer lanes throughout: v5e's VPU has no 16-bit integer
    # compare/max/abs (and the dynamic rotate is 32-bit only), so narrower
    # accumulators buy nothing on this generation; f32 measures no faster.
    acc_dtype = jnp.int32
    lf = lbuf[0:halo_rows, :].astype(acc_dtype)
    rf32 = rbuf[0:halo_rows, :].astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (halo_rows, wp), dimension=1)
    in_width = col < true_width

    def body(d, carry):
        best, best_d = carry
        # shifted[x] = R[x - d]: lane-rotate right by d. Wrapped lanes land
        # only in the x < d region, which is masked to the invalid cost.
        shifted = pltpu.roll(rf32, d, 1)
        diff = jnp.abs(lf - shifted)
        diff = jnp.where(col < d, jnp.asarray(invalid_cost, acc_dtype), diff)
        diff = jnp.where(in_width, diff, jnp.asarray(0, acc_dtype))
        # Separable (2r+1)² box via doubling sliding sums (≈2·log₂ adds
        # per axis instead of 2r); zero extension keeps clipped-window
        # semantics.
        vsum = _sliding_sum(diff, 2 * r + 1, axis=0)[0:tile_h, :]
        hp = jnp.pad(vsum, ((0, 0), (r, r + 2 * r + 2)))
        sad = _sliding_sum(hp, 2 * r + 1, axis=1)[:, 0:wp]
        upd = sad < best
        best = jnp.where(upd, sad, best)
        # Keep the argmin in the same lane width as the compare mask —
        # mixed 16/32-bit select layouts are not relayout-able by Mosaic.
        best_d = jnp.where(upd, d, best_d)
        return best, best_d

    init = (
        jnp.full((tile_h, wp), jnp.iinfo(acc_dtype).max, acc_dtype),
        jnp.zeros((tile_h, wp), jnp.int32),
    )
    _, best_d = jax.lax.fori_loop(0, num_disparities, body, init)
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
    from gpu_stereo_matching_tpu.core.validation import check_gray_pair

    check_gray_pair(left_gray, right_gray, num_disparities, "fused_block_matching")
    h, w = left_gray.shape
    r = radius
    num_tiles = -(-h // tile_h)
    hp = num_tiles * tile_h
    slab_rows = -(-(tile_h + 2 * r) // 8) * 8
    # Rows: r zeros on top, then enough bottom padding that the last tile's
    # sublane-aligned DMA slab stays in bounds.
    total_rows = max((num_tiles - 1) * tile_h + slab_rows, hp + 2 * r)
    # Lanes: pad W to a 128 multiple (Mosaic DMA slice alignment).
    wp = -(-w // 128) * 128

    left_p = jnp.zeros((total_rows, wp), jnp.uint8)
    left_p = jax.lax.dynamic_update_slice(left_p, left_gray, (r, 0))
    right_p = jnp.zeros((total_rows, wp), jnp.uint8)
    right_p = jax.lax.dynamic_update_slice(right_p, right_gray, (r, 0))

    kernel = functools.partial(
        _kernel,
        num_disparities=num_disparities,
        radius=r,
        tile_h=tile_h,
        true_width=w,
        invalid_cost=255,
    )
    disp = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, wp), jnp.uint8),
            pltpu.VMEM((slab_rows, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(left_p, right_p)
    return disp[:h, :w]


def _key_kernel(
    d0_ref,        # (1, 1) SMEM: first disparity of this shard's range
    left_hbm,
    right_hbm,
    key_out,       # (TILE_H, Wp) i32: min over local d of SAD·total_d + d
    lbuf,
    rbuf,
    sems,
    *,
    count: int,
    total_disparities: int,
    radius: int,
    tile_h: int,
    true_width: int,
    invalid_cost: int,
):
    i = pl.program_id(0)
    r = radius
    halo_rows = tile_h + 2 * r
    slab_rows = lbuf.shape[0]
    wp = key_out.shape[1]
    d0 = d0_ref[0, 0]

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
    col = jax.lax.broadcasted_iota(jnp.int32, (halo_rows, wp), dimension=1)
    in_width = col < true_width

    def body(i_d, best_key):
        d = d0 + i_d
        shifted = pltpu.roll(rf32, d, 1)
        diff = jnp.abs(lf - shifted)
        diff = jnp.where(col < d, invalid_cost, diff)
        diff = jnp.where(in_width, diff, 0)
        vsum = _sliding_sum(diff, 2 * r + 1, axis=0)[0:tile_h, :]
        hp = jnp.pad(vsum, ((0, 0), (r, r + 2 * r + 2)))
        sad = _sliding_sum(hp, 2 * r + 1, axis=1)[:, 0:wp]
        key = sad * total_disparities + d
        return jnp.minimum(best_key, key)

    init = jnp.full((tile_h, wp), jnp.iinfo(jnp.int32).max, jnp.int32)
    key_out[:, :] = jax.lax.fori_loop(0, count, body, init)


@functools.partial(
    jax.jit,
    static_argnames=(
        "count", "total_disparities", "radius", "tile_h", "interpret"
    ),
)
def fused_block_matching_key(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    d_start: jnp.ndarray,
    count: int,
    total_disparities: int,
    radius: int = 5,
    tile_h: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Partial-range WTA for disparity-sharded execution → (H, W) int32 keys.

    Evaluates disparities ``d_start .. d_start+count-1`` (``d_start`` may be
    traced, e.g. a mesh-axis index) and returns the packed minimum
    ``SAD·total_disparities + d`` — the associative quantity a cross-shard
    ``pmin`` reduces to recover the global (SAD, argmin) pair with
    smallest-d tie-breaking.
    """
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
    d0 = jnp.asarray(d_start, jnp.int32).reshape(1, 1)

    kernel = functools.partial(
        _key_kernel,
        count=count,
        total_disparities=total_disparities,
        radius=r,
        tile_h=tile_h,
        true_width=w,
        invalid_cost=255,
    )
    keys = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, wp), jnp.uint8),
            pltpu.VMEM((slab_rows, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(d0, left_p, right_p)
    return keys[:h, :w]


def _batched_kernel(
    left_hbm,      # (B, rows, Wp) u8
    right_hbm,     # (B, rows, Wp) u8
    disp_out,      # (1, TILE_H, Wp) i32 block
    lbuf,
    rbuf,
    sems,
    *,
    num_disparities: int,
    radius: int,
    tile_h: int,
    true_width: int,
    invalid_cost: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    r = radius
    halo_rows = tile_h + 2 * r
    slab_rows = lbuf.shape[0]
    wp = disp_out.shape[2]

    row0 = i * tile_h
    cp_l = pltpu.make_async_copy(
        left_hbm.at[b, pl.ds(row0, slab_rows), :], lbuf, sems.at[0]
    )
    cp_r = pltpu.make_async_copy(
        right_hbm.at[b, pl.ds(row0, slab_rows), :], rbuf, sems.at[1]
    )
    cp_l.start()
    cp_r.start()
    cp_l.wait()
    cp_r.wait()

    lf = lbuf[0:halo_rows, :].astype(jnp.int32)
    rf32 = rbuf[0:halo_rows, :].astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (halo_rows, wp), dimension=1)
    in_width = col < true_width

    def body(d, carry):
        best, best_d = carry
        shifted = pltpu.roll(rf32, d, 1)
        diff = jnp.abs(lf - shifted)
        diff = jnp.where(col < d, invalid_cost, diff)
        diff = jnp.where(in_width, diff, 0)
        vsum = _sliding_sum(diff, 2 * r + 1, axis=0)[0:tile_h, :]
        hp = jnp.pad(vsum, ((0, 0), (r, r + 2 * r + 2)))
        sad = _sliding_sum(hp, 2 * r + 1, axis=1)[:, 0:wp]
        upd = sad < best
        return jnp.where(upd, sad, best), jnp.where(upd, d, best_d)

    init = (
        jnp.full((tile_h, wp), jnp.iinfo(jnp.int32).max, jnp.int32),
        jnp.zeros((tile_h, wp), jnp.int32),
    )
    _, best_d = jax.lax.fori_loop(0, num_disparities, body, init)
    disp_out[0, :, :] = best_d


@functools.partial(
    jax.jit,
    static_argnames=("num_disparities", "radius", "tile_h", "interpret"),
)
def fused_block_matching_batched(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    num_disparities: int = 64,
    radius: int = 5,
    tile_h: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused disparity: (B, H, W) uint8 pairs → (B, H, W) int32.

    One pallas_call with a (frame, row-tile) grid — a whole video batch is
    a single device dispatch with no per-frame XLA glue.
    """
    from gpu_stereo_matching_tpu.core.validation import check_gray_pair

    check_gray_pair(left_gray, right_gray, num_disparities, "fused_batched")
    bsz, h, w = left_gray.shape
    r = radius
    num_tiles = -(-h // tile_h)
    hp = num_tiles * tile_h
    slab_rows = -(-(tile_h + 2 * r) // 8) * 8
    total_rows = max((num_tiles - 1) * tile_h + slab_rows, hp + 2 * r)
    wp = -(-w // 128) * 128

    left_p = jnp.zeros((bsz, total_rows, wp), jnp.uint8)
    left_p = jax.lax.dynamic_update_slice(left_p, left_gray, (0, r, 0))
    right_p = jnp.zeros((bsz, total_rows, wp), jnp.uint8)
    right_p = jax.lax.dynamic_update_slice(right_p, right_gray, (0, r, 0))

    kernel = functools.partial(
        _batched_kernel,
        num_disparities=num_disparities,
        radius=r,
        tile_h=tile_h,
        true_width=w,
        invalid_cost=255,
    )
    disp = pl.pallas_call(
        kernel,
        grid=(bsz, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, wp), jnp.uint8),
            pltpu.VMEM((slab_rows, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(left_p, right_p)
    return disp[:, :h, :w]

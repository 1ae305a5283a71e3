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
  reproduced exactly. Both masks are constant down image columns, so they
  are applied *after* the vertical sum (on ``tile_h`` rows instead of the
  ``tile_h + 2r`` halo slab, with the post-sum constants ``255·(2r+1)`` and
  ``0``) — bit-identical, ~2 fewer halo-slab selects per disparity; the
  width mask vanishes statically when W is already a lane multiple (1080p).

When ``255·(2r+1)² < 2¹⁵`` (every radius ≤ 5, incl. the reference's
default) the *packed-pair* kernel runs instead: two disparities' diffs ride
the two 16-bit halves of each int32 lane through the separable sliding
sums, halving the dominant lane-direction shifted-add work (measured ~1.8×
on v5e, bit-identical; see ``_packed_pair_body`` for the field layout and
edge-column proofs). The unpacked kernels remain as the fallback for odd
disparity counts and large radii.

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


def _sad_one_disparity(
    lf, rf32, col_t, d, *, radius, tile_h, wp, true_width, invalid_cost,
    row_counts=None,
):
    """Clipped-window SAD map for one disparity (shared by all kernels).

    ``lf``/``rf32`` are the int32 halo slabs, ``col_t`` a (tile_h, wp) lane
    iota. Masks are applied post-vertical-sum (see module docstring).
    ``row_counts`` (tile_h, 1), when given, is the clipped vertical window
    size per row; invalid columns then sum to ``invalid_cost·count`` exactly
    as the materialized ops volume does at the global top/bottom rows
    (needed by the split-phase kernel, whose SAD volume is the product).
    The fused WTA kernels keep the constant full-window value — cheaper,
    and bit-identical in the argmin (property-swept in tests).
    """
    k = 2 * radius + 1
    shifted = pltpu.roll(rf32, d, 1)
    diff = jnp.abs(lf - shifted)
    vsum = _sliding_sum(diff, k, axis=0)[0:tile_h, :]
    inv_v = invalid_cost * k if row_counts is None else invalid_cost * row_counts
    vsum = jnp.where(col_t < d, inv_v, vsum)
    if true_width < wp:
        vsum = jnp.where(col_t < true_width, vsum, 0)
    hp = jnp.pad(vsum, ((0, 0), (radius, radius + k + 1)))
    return _sliding_sum(hp, k, axis=1)[:, 0:wp]


def _packed_pair_supported(num_disparities: int, radius: int) -> bool:
    """Whether the two-disparities-per-lane kernel is exact for this config.

    Each 16-bit half must hold a full window sum of invalid costs
    (``255·(2r+1)²``) without carrying into the neighboring field, the
    packed key needs ``d`` in 8 bits, and pairing needs an even count.
    """
    k = 2 * radius + 1
    return (
        num_disparities % 2 == 0
        and num_disparities <= 256
        and radius >= 1
        and 255 * k * k < (1 << 15)
    )


def _banded_vertical_matrix(tile_h: int, halo_rows: int, k: int):
    """(tile_h, halo_rows) bf16 0/1 band: row i sums input rows [i, i+k).

    Built through a 32-bit f32 select and converted at the end — a direct
    bf16 select on the i1 compare mask hits an un-relayout-able
    (8,128)→(16,128) mask layout in Mosaic v5e (same class as the known
    mixed 16/32-bit select constraint, CLAUDE.md)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (tile_h, halo_rows), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (tile_h, halo_rows), 1)
    band = (ci >= ri) & (ci < ri + k)
    return jnp.where(band, jnp.float32(1), jnp.float32(0)).astype(
        jnp.bfloat16
    )


def _packed_pair_body_mxu(
    lf, lf_m1, col_t, padfix, shifted, d_lo, *,
    radius, tile_h, wp, true_width, invalid_cost,
):
    """MXU variant of :func:`_packed_pair_body` (round-5 experiment,
    VERDICT r4 weak #3): the VERTICAL sliding sum becomes a banded bf16
    matmul — ``vsum = B (tile_h × halo) @ diff (halo × W)`` with f32
    accumulation — so the k-row column sums ride the (otherwise idle)
    MXU while the VPU keeps the horizontal packed path. Exact: diffs
    ≤ 255 are bf16-representable, the 0/1 band is exact, and f32
    accumulates integers ≤ 255·k ≪ 2²⁴ without rounding; the f32→i32
    casts are exact integer conversions. The two halves matmul
    separately (a packed int operand would exceed f32's exact range) and
    repack for the shared horizontal sum. A/B vs the VPU body:
    tools/exp_mxu_sad.py; see RESULTS.md for the measured verdict.
    """
    r = radius
    k = 2 * r + 1
    halo_rows = lf.shape[0]
    inv = invalid_cost * k
    inv2 = jnp.int32(inv) | (jnp.int32(inv) << 16)
    # i32 → f32 → bf16 (two-step: Mosaic v5e lacks some direct narrow
    # integer↔16-bit-float conversions; f32 is the safe waypoint).
    diff_lo = (
        jnp.abs(lf - shifted).astype(jnp.float32).astype(jnp.bfloat16)
    )
    diff_hi = (
        jnp.abs(lf_m1 - shifted).astype(jnp.float32).astype(jnp.bfloat16)
    )
    bv = _banded_vertical_matrix(tile_h, halo_rows, k)
    dn = (((1,), (0,)), ((), ()))
    vs_lo = jax.lax.dot_general(
        bv, diff_lo, dn, preferred_element_type=jnp.float32
    )
    vs_hi = jax.lax.dot_general(
        bv, diff_hi, dn, preferred_element_type=jnp.float32
    )
    vsum = vs_lo.astype(jnp.int32) + (vs_hi.astype(jnp.int32) << 16)
    vsum = jnp.where(col_t < d_lo, inv2, vsum)
    vsum = jnp.where(col_t == (true_width - 1), vsum & jnp.int32(0xFFFF), vsum)
    if true_width < wp:
        vsum = jnp.where(col_t < true_width, vsum, 0)
    hp = jnp.pad(vsum, ((0, 0), (r + 1, r + k + 1)))
    hp = jnp.where(padfix, jnp.int32(inv) << 16, hp)
    sad2 = _sliding_sum(hp, k, axis=1)
    sad_lo = sad2[:, 1 : wp + 1] & jnp.int32(0xFFFF)
    sad_hi = jax.lax.shift_right_logical(sad2[:, 0:wp], 16)
    return sad_lo, sad_hi


def _packed_pair_body(
    lf, lf_m1, col_t, padfix, shifted, d_lo, *,
    radius, tile_h, wp, true_width, invalid_cost,
):
    """SAD maps for disparities (d_lo, d_lo+1) in one pass over the sums.

    Two 16-bit fields of one int32 lane carry both disparities' diffs
    through the separable sliding sums (exact: sums < 2¹⁵, no carries).
    The hi field holds the *next column's* diff — ``hi'(x) = |L(x+1) −
    R(x−d_lo)| = diff(x+1, d_lo+1)`` — so it reuses the same shifted right
    slab and shares the single ``col < d_lo`` validity mask (hi' invalid ⟺
    x+1 < d_lo+1 ⟺ x < d_lo). The left pad is r+1 wide so the sliding
    output covers hi' column −1 (= real column 0, whose invalid cost is a
    live WTA candidate for every odd disparity); position r of the pad
    carries that column's invalid sum in the hi field only. Cropping the
    sliding output at offset 0 (hi) / 1 (lo) realigns both halves to real
    columns. Returns (sad_lo, sad_hi), each (tile_h, wp) int32.
    """
    r = radius
    k = 2 * r + 1
    inv = invalid_cost * k
    inv2 = jnp.int32(inv) | (jnp.int32(inv) << 16)
    diff_lo = jnp.abs(lf - shifted)
    diff_hi = jnp.abs(lf_m1 - shifted)
    packed = diff_lo + (diff_hi << 16)
    vsum = _sliding_sum(packed, k, axis=0)[0:tile_h, :]
    vsum = jnp.where(col_t < d_lo, inv2, vsum)
    # hi' column w-1 is diff(w, d_hi): outside the image, contributes 0.
    vsum = jnp.where(col_t == (true_width - 1), vsum & jnp.int32(0xFFFF), vsum)
    if true_width < wp:
        vsum = jnp.where(col_t < true_width, vsum, 0)
    hp = jnp.pad(vsum, ((0, 0), (r + 1, r + k + 1)))
    hp = jnp.where(padfix, jnp.int32(inv) << 16, hp)
    sad2 = _sliding_sum(hp, k, axis=1)
    sad_lo = sad2[:, 1 : wp + 1] & jnp.int32(0xFFFF)
    sad_hi = jax.lax.shift_right_logical(sad2[:, 0:wp], 16)
    return sad_lo, sad_hi


def _packed_pair_prelude(lbuf, rbuf, *, radius, tile_h, wp):
    """Shared hoisted state for the packed-pair disparity loop."""
    halo_rows = tile_h + 2 * radius
    k = 2 * radius + 1
    lf = lbuf[0:halo_rows, :].astype(jnp.int32)
    rf = rbuf[0:halo_rows, :].astype(jnp.int32)
    lf_m1 = pltpu.roll(lf, wp - 1, 1)  # L(x+1): rotate left by one lane
    col_t = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wp), dimension=1)
    col_p = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, wp + 2 * radius + k + 2), dimension=1
    )
    padfix = col_p == radius
    return lf, lf_m1, rf, col_t, padfix


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
    # Single-buffered slab DMA. Double-buffered prefetch (tile i+1's slabs
    # started before tile i's disparity loop) was measured at 443 fps vs
    # 448-467 single-buffered @1080p/64d — the two ~77 KB slab copies are
    # negligible next to the 64-disparity loop, and the traced buffer-slot
    # indexing costs more than the latency it hides. Recorded in ROADMAP.
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
    col_t = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wp), dimension=1)

    def body(d, carry):
        best, best_d = carry
        # shifted[x] = R[x - d]: lane-rotate right by d. Wrapped lanes land
        # only in the x < d region, which is masked to the invalid cost.
        sad = _sad_one_disparity(
            lf, rf32, col_t, d,
            radius=r, tile_h=tile_h, wp=wp,
            true_width=true_width, invalid_cost=invalid_cost,
        )
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


def _packed_unroll(num_disparities: int) -> int:
    """Pairs per loop iteration: independent sum chains give the scheduler
    instruction-level parallelism (~8% measured at 4 on v5e; 8 measured
    no better than 4 through the tunnel's ±3% variance, round 4)."""
    pairs = num_disparities // 2
    for k in (4, 2):
        if pairs % k == 0:
            return k
    return 1


def _packed_wta_loop(
    lbuf, rbuf, *, num_disparities, radius, tile_h, wp, true_width,
    invalid_cost, mxu=False,
):
    """Shared packed-pair disparity loop → (tile_h, wp) int32 disparity."""
    lf, lf_m1, rf, col_t, padfix = _packed_pair_prelude(
        lbuf, rbuf, radius=radius, tile_h=tile_h, wp=wp
    )
    unroll = _packed_unroll(num_disparities)
    pair_body = _packed_pair_body_mxu if mxu else _packed_pair_body

    def body(j, carry):
        shifted, best_lo, best_hi = carry
        d0 = 2 * unroll * j
        for k in range(unroll):
            sh = shifted if k == 0 else pltpu.roll(shifted, 2 * k, 1)
            sad_lo, sad_hi = pair_body(
                lf, lf_m1, col_t, padfix, sh, d0 + 2 * k,
                radius=radius, tile_h=tile_h, wp=wp,
                true_width=true_width, invalid_cost=invalid_cost,
            )
            best_lo = jnp.minimum(best_lo, (sad_lo << 8) | (d0 + 2 * k))
            best_hi = jnp.minimum(best_hi, (sad_hi << 8) | (d0 + 2 * k + 1))
        return pltpu.roll(shifted, 2 * unroll, 1), best_lo, best_hi

    imax = jnp.iinfo(jnp.int32).max
    init = (
        rf,
        jnp.full((tile_h, wp), imax, jnp.int32),
        jnp.full((tile_h, wp), imax, jnp.int32),
    )
    _, best_lo, best_hi = jax.lax.fori_loop(
        0, num_disparities // (2 * unroll), body, init
    )
    return jnp.minimum(best_lo, best_hi) & 255


def _packed_kernel(
    left_hbm, right_hbm, disp_out, lbuf, rbuf, sems, *,
    num_disparities, radius, tile_h, true_width, invalid_cost, mxu=False,
):
    """Packed-pair (two disparities per int32 lane) fused SAD+WTA kernel."""
    i = pl.program_id(0)
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
    disp_out[:, :] = _packed_wta_loop(
        lbuf, rbuf,
        num_disparities=num_disparities, radius=radius, tile_h=tile_h,
        wp=wp, true_width=true_width, invalid_cost=invalid_cost, mxu=mxu,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_disparities", "radius", "tile_h", "interpret",
                     "mxu"),
)
def fused_block_matching(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    num_disparities: int = 64,
    radius: int = 5,
    tile_h: int = 32,
    interpret: bool = False,
    mxu: bool = False,
) -> jnp.ndarray:
    """Fused disparity of a (H, W) uint8 pair → (H, W) int32.

    Bit-exact with the unfused XLA ops path; ``interpret=True`` runs the
    Pallas interpreter (the CPU-test / "sanitizer" mode). ``mxu=True``
    (packed-pair configs only) runs the banded-matmul vertical-sum
    experiment (:func:`_packed_pair_body_mxu`).
    """
    from gpu_stereo_matching_tpu.core.validation import check_gray_pair

    check_gray_pair(left_gray, right_gray, num_disparities, "fused_block_matching")
    if mxu and not _packed_pair_supported(num_disparities, radius):
        raise ValueError("mxu variant requires a packed-pair config")
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

    if _packed_pair_supported(num_disparities, r):
        kernel = functools.partial(
            _packed_kernel,
            num_disparities=num_disparities, radius=r, tile_h=tile_h,
            true_width=w, invalid_cost=255, mxu=mxu,
        )
    else:
        kernel = functools.partial(
            _kernel,
            num_disparities=num_disparities, radius=r, tile_h=tile_h,
            true_width=w, invalid_cost=255,
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
    col_t = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wp), dimension=1)

    def body(i_d, best_key):
        d = d0 + i_d
        sad = _sad_one_disparity(
            lf, rf32, col_t, d,
            radius=r, tile_h=tile_h, wp=wp,
            true_width=true_width, invalid_cost=invalid_cost,
        )
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
    from gpu_stereo_matching_tpu.core.validation import check_gray_pair

    check_gray_pair(
        left_gray, right_gray, total_disparities, "fused_block_matching_key"
    )
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

    k = 2 * r + 1
    use_packed = count % 2 == 0 and r >= 1 and 255 * k * k < (1 << 15)
    kernel = functools.partial(
        _packed_key_kernel if use_packed else _key_kernel,
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


def _packed_key_kernel(
    d0_ref, left_hbm, right_hbm, key_out, lbuf, rbuf, sems, *,
    count, total_disparities, radius, tile_h, true_width, invalid_cost,
):
    """Packed-pair variant of the partial-range packed-key WTA kernel."""
    i = pl.program_id(0)
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
    lf, lf_m1, rf, col_t, padfix = _packed_pair_prelude(
        lbuf, rbuf, radius=radius, tile_h=tile_h, wp=wp
    )

    def body(j, carry):
        shifted, best = carry
        d_lo = d0 + 2 * j
        sad_lo, sad_hi = _packed_pair_body(
            lf, lf_m1, col_t, padfix, shifted, d_lo,
            radius=radius, tile_h=tile_h, wp=wp,
            true_width=true_width, invalid_cost=invalid_cost,
        )
        best = jnp.minimum(best, sad_lo * total_disparities + d_lo)
        best = jnp.minimum(best, sad_hi * total_disparities + (d_lo + 1))
        return pltpu.roll(shifted, 2, 1), best

    init = (
        pltpu.roll(rf, d0, 1),
        jnp.full((tile_h, wp), jnp.iinfo(jnp.int32).max, jnp.int32),
    )
    _, best = jax.lax.fori_loop(0, count // 2, body, init)
    key_out[:, :] = best


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
    col_t = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wp), dimension=1)

    def body(d, carry):
        best, best_d = carry
        sad = _sad_one_disparity(
            lf, rf32, col_t, d,
            radius=r, tile_h=tile_h, wp=wp,
            true_width=true_width, invalid_cost=invalid_cost,
        )
        upd = sad < best
        return jnp.where(upd, sad, best), jnp.where(upd, d, best_d)

    init = (
        jnp.full((tile_h, wp), jnp.iinfo(jnp.int32).max, jnp.int32),
        jnp.zeros((tile_h, wp), jnp.int32),
    )
    _, best_d = jax.lax.fori_loop(0, num_disparities, body, init)
    disp_out[0, :, :] = best_d


def _packed_batched_kernel(
    left_hbm, right_hbm, disp_out, lbuf, rbuf, sems, *,
    num_disparities, radius, tile_h, true_width, invalid_cost,
):
    """Packed-pair variant of the batched fused kernel."""
    b = pl.program_id(0)
    i = pl.program_id(1)
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
    disp_out[0, :, :] = _packed_wta_loop(
        lbuf, rbuf,
        num_disparities=num_disparities, radius=radius, tile_h=tile_h,
        wp=wp, true_width=true_width, invalid_cost=invalid_cost,
    )


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
        _packed_batched_kernel
        if _packed_pair_supported(num_disparities, r)
        else _batched_kernel,
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

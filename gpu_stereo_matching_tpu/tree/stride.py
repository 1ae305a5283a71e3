"""Stride-bucket tree aggregation: the gather-minimal exact tree filter.

The plan-order formulation (:mod:`tree.hpd`) made the heavy-path filter
scatter-free, but it still pays for the tree's irregularity with *dense
index streams*: every round gathers K·L light rows and L head rows even
though only ~5% of them are real (Art 463×370: 842k gathered rows to move
~81k real values — ~11 ms of the 25.7 ms frame). This module restructures
the same mathematics — identical to the sequential reference filter
``STMatching/SegmentTree.cpp:148-181`` up to float summation order —
around a **stride-bucket layout** that makes every structural access
static:

* Within each light-round, heavy paths are grouped into power-of-two
  length buckets. A bucket with stride S and P path slots stores path
  ``p``'s ``j``-th node at local offset ``j·P + p`` — paths interleaved,
  not concatenated. Three consequences:

  1. **Path heads live in the first P rows of each bucket** — extracting
     every head value of a round is a static slice + concat, not a gather.
     The down-pass "pull the parent's final value" therefore gathers only
     H real head rows per round instead of L dense rows.
  2. **Scans are per-bucket with exactly log2(S) doubling steps** over a
     reshaped (S, P, D) block — paths occupy disjoint columns, so no
     segment-boundary masking is needed and short rounds stop early
     (the plan-order layout scanned every round at the longest path's
     step count). ~2× less scan work at Middlebury scale.
  3. **Bucket padding replaces round padding**: positions are padded per
     (round, pow2-length bucket) instead of per round, cutting total plan
     positions ~1.64× → ~1.3× of N.

* The up-pass light pull ("add w·S of each light child into its parent's
  row") needs **no index stream at all**: light children of round t are
  exactly the path heads of round t+1 (a light edge starts a new path).
  The filter extracts round t+1's head values (static slices), reorders
  them by (parent position, sibling rank) with one H-row gather
  (``head_perm``), forms sibling prefix sums with two shifted adds, and
  addresses the result with ``base = exclusive-cumsum(light_count)`` —
  the per-position light counts ride two spare bits in the codes stream,
  so the 24-bit light/head index streams of the coded plan (~2.6 MB/frame)
  vanish from the transport entirely.

Per-frame gather rows on Art drop from ~1.29M (coded plan) to ~0.66M:
perm in (≈total), one destination-sized light pull per round (≈total),
2·H head-side rows (H ≈ 40k paths), and inv_perm out (N).

Plan payload (the **lean** transport format, round 5, the production
default): ``ints`` = bucket-head node ids ‖ per-round [parent_pos ‖
head_perm], 24-bit-packed u8 triples; ``codes`` = (total,) u8
parent-distance codes; ``flg`` = nibble-packed 3-bit flags (two positions
per byte); ``res`` = 2-bit heavy-chain perm residuals; ``table`` = the
256-entry exact weight LUT (:func:`tree.hpd.weight_lut`). Flags: bit0 =
force-zero weight (root and padding), bits1-2 = light-child count (≤ 3:
a non-root grid node has ≤ 3 children of which one is heavy; the root
≤ 4, one heavy). The perm ships as residuals (decoded in-graph) and
**inv_perm ships not at all** — it is recomputed on device from the
decoded perm (argsort-based by default; the values are exact integers
either way, so the filter output is bit-identical to the shipped-inv
variant). ``lean=False`` keeps the round-4 format (verbatim codes
(2, total), inv_perm in ``ints``) for A/B tooling and device-resident
plans that never pay transport.

Static layout (bucket path-slot caps, real round count) is converged
through the same persisted registry as the HPD plans so all frames of a
video share one compiled executable.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpu_stereo_matching_tpu.tree.builder import SegmentTree
from gpu_stereo_matching_tpu.tree.hpd import (
    _exact_lut,
    _pow2,
    _registry_bucket_caps,
    _registry_real_rounds,
    _registry_rounds,
    _registry_scan_caps,
    _unpack_ints24,
    pack_ints24,
    weight_lut,
)


# In-graph perm inversion method for lean plans ("argsort" | "scatter");
# traced statically, so changing it needs a fresh process. Round-5 v5e
# A/B (tools/exp_inv_perm.py, 8-frame Art group): full-program
# 14.52 ms/frame scatter vs 14.67 argsort vs 13.73 shipping inv_perm —
# i.e. the in-graph inversion costs ~0.8 ms/frame and pays for itself
# whenever plan transport is slower than ~0.9 GB/s; `lean=False` keeps
# the shipped-inv layout for device-resident plans. NOTE: a drop-mode
# scatter; do NOT vmap lean-plan filters (vmapped scatters are
# catastrophic on this stack — CLAUDE.md), the group paths unroll.
_INV_METHOD = os.environ.get("GSM_SB_INV", "scatter")


def _pad_count(p: int) -> int:
    """Path-slot granularity: pow2 up to 8, then quarter-pow2 multiples.

    Coarse enough that the layout registry converges in a few frames
    (every cap bump recompiles), fine enough that slot padding stays
    under ~25% — unlike the plan-order layout's full pow2 round caps.
    """
    if p <= 0:
        return 0
    if p <= 8:
        return _pow2(p)
    g = 1 << (int(p).bit_length() - 3)  # 2^(floor(log2 p) - 2)
    return ((p + g - 1) // g) * g


def _decompose(tree: SegmentTree):
    """Heavy-path decomposition: per node (light_depth, head, path depth).

    Same construction as ``tree.hpd._packed_arrays_numpy`` (heavy child =
    max subtree, ties lowest id; pointer doubling for depths/heads).
    """
    n = tree.num_nodes
    parent = tree.parent.astype(np.int64)
    sub = tree.subtree_size

    heavy = np.full(n, -1, np.int64)
    ch = np.arange(n)
    ch = ch[ch != 0]
    order = np.lexsort((ch, -sub[ch], parent[ch]))
    ch_sorted = ch[order]
    par_sorted = parent[ch_sorted]
    first = np.ones(len(ch_sorted), bool)
    first[1:] = par_sorted[1:] != par_sorted[:-1]
    heavy[par_sorted[first]] = ch_sorted[first]

    is_heavy_child = np.zeros(n, bool)
    is_heavy_child[heavy[heavy >= 0]] = True
    light = ~is_heavy_child
    light[0] = False

    light_depth64 = light.astype(np.int64)
    jump = parent.copy()
    head_ptr = np.where(light | (np.arange(n) == 0), np.arange(n), parent)
    max_depth = int(tree.num_levels)
    rounds = max(1, int(np.ceil(np.log2(max(max_depth, 2)))))
    for _ in range(rounds):
        light_depth64 = light_depth64 + light_depth64[jump]
        jump = jump[jump]
        head_ptr = head_ptr[head_ptr]
    head_of = head_ptr.astype(np.int64)
    depth_in_path = (tree.level_of.astype(np.int64)
                     - tree.level_of.astype(np.int64)[head_of])
    return light_depth64.astype(np.int64), head_of, depth_in_path


@dataclasses.dataclass(frozen=True)
class StridePlan:
    """Stride-bucket plan (see module docstring).

    ``buckets``: per round, a tuple of ``(exp, P)`` — stride ``2**exp``
    with ``P`` path slots; zero-slot buckets are omitted. ``n_real`` is
    the number of leading rounds containing real nodes (the registry-
    padded tail is skipped). ``ints`` is the 24-bit-packed index payload
    ``perm(total) ‖ inv_perm(N) ‖ per round [parent_pos(H_t) ‖
    head_perm(H_t)]`` with ``H_t = Σ P`` over round t's buckets.
    """

    num_nodes: int
    total_pos: int
    buckets: Tuple[Tuple[Tuple[int, int], ...], ...]
    n_real: int
    ints: jnp.ndarray   # (3, L) u8 (24-bit packed)
    codes: jnp.ndarray  # lean: (total,) u8 dist codes; legacy: (2, total)
    table: jnp.ndarray  # (256, 2) f32
    # Compressed-perm format (``res is not None``): ``res`` carries the
    # 2-bit heavy-chain residual codes (4 per byte) from which the filter
    # reconstructs the perm in-graph — row j of a bucket column is row
    # j−1's heavy child, a grid neighbor, so perm[j]−perm[j−1]−W has only
    # four possible values {0, 1−W, −1−W, −2W} (exact; ~4× less perm
    # transport). ``width`` is the image W the residuals are coded
    # against. ``res=None`` is the uncompressed layout (perm shipped
    # verbatim), kept for tooling/device-resident plans.
    res: "jnp.ndarray | None" = None   # ((R+3)//4,) u8, R = total − H_all
    width: int = 0
    # Lean transport format (``flg is not None``, requires ``res``):
    # ``codes`` is (total,) dist codes only, ``flg`` is the 3-bit flags
    # stream nibble-packed two-per-byte, and ``ints`` has NO inv_perm
    # section (``heads ‖ per-round streams``) — the filter inverts the
    # decoded perm in-graph instead (exact integers; bit-identical
    # output). ``flg=None`` is the legacy layout with flags in codes[1]
    # and inv_perm shipped.
    flg: "jnp.ndarray | None" = None   # ((total+1)//2,) u8

    @property
    def layout_key(self):
        return (
            self.num_nodes, self.total_pos, self.buckets, self.n_real,
            self.width, self.res is None, self.flg is None,
        )

    @staticmethod
    def from_tree(
        tree: SegmentTree, sigma: float, native: bool = True,
        device: bool = True, lean: bool = True,
    ) -> "StridePlan":
        plan = build_stride_plan(tree, sigma, native=native, lean=lean)
        if device:
            plan = plan.to_device()
        return plan

    def to_device(self) -> "StridePlan":
        """Upload every plan array (jnp.asarray) preserving the layout."""
        return StridePlan(
            self.num_nodes, self.total_pos, self.buckets, self.n_real,
            jnp.asarray(self.ints), jnp.asarray(self.codes),
            jnp.asarray(self.table),
            res=None if self.res is None else jnp.asarray(self.res),
            width=self.width,
            flg=None if self.flg is None else jnp.asarray(self.flg),
        )

    def frame(self, g: int) -> "StridePlan":
        """Per-frame view of a stacked plan (leading batch axis on the
        per-frame arrays; ``table`` is shared)."""
        return StridePlan(
            self.num_nodes, self.total_pos, self.buckets, self.n_real,
            self.ints[g], self.codes[g], self.table,
            res=None if self.res is None else self.res[g],
            width=self.width,
            flg=None if self.flg is None else self.flg[g],
        )

    @property
    def transport_nbytes(self) -> int:
        """Bytes shipped host→device per plan (all per-frame streams)."""
        n = np.asarray(self.ints).nbytes + np.asarray(self.codes).nbytes
        if self.res is not None:
            n += np.asarray(self.res).nbytes
        if self.flg is not None:
            n += np.asarray(self.flg).nbytes
        return n


jax.tree_util.register_pytree_node(
    StridePlan,
    lambda p: (
        (p.ints, p.codes, p.table, p.res, p.flg),
        (p.num_nodes, p.total_pos, p.buckets, p.n_real, p.width),
    ),
    lambda aux, ch: StridePlan(
        aux[0], aux[1], aux[2], aux[3], ch[0], ch[1], ch[2],
        res=ch[3], width=aux[4], flg=ch[4],
    ),
)


def _layout_from_heads(n: int, head_round, path_len):
    """Registry-converged static layout from per-path (round, length).

    Returns (buckets, n_real, exp_of) where buckets[t] is the per-exponent
    (stride 2^exp, path-slot cap) tuple for round t.
    """
    n_rounds = int(head_round.max()) + 1
    padded_rounds = _registry_rounds(n, _pow2(n_rounds))

    # Max path length cap per round (shared semantic with the coded
    # plans' doubling-scan schedule registry).
    need_caps = []
    for t in range(padded_rounds):
        sel = head_round == t
        need_caps.append(
            _pow2(int(path_len[sel].max())) if sel.any() else 1
        )
    scan_caps = _registry_scan_caps(n, padded_rounds, need_caps)

    # Per-(round, exponent) path-slot counts, granularity-padded.
    exp_of = np.zeros(len(path_len), np.int64)
    nz = path_len > 1
    exp_of[nz] = np.ceil(np.log2(path_len[nz])).astype(np.int64)
    needed = []
    need_real = 0
    for t in range(padded_rounds):
        sel = head_round == t
        max_e = int(np.log2(scan_caps[t]))
        row = [0] * (max_e + 1)
        if sel.any():
            need_real = t + 1
            for e, c in zip(*np.unique(exp_of[sel], return_counts=True)):
                row[int(e)] = _pad_count(int(c))
        needed.append(row)
    caps = _registry_bucket_caps(n, padded_rounds, needed)
    n_real = _registry_real_rounds(n, padded_rounds, need_real)
    buckets = tuple(
        tuple((e, int(p)) for e, p in enumerate(row) if p > 0)
        for row in caps
    )
    return buckets, n_real, exp_of


def _layout_offsets(buckets):
    """Static offsets for a bucket layout: per-round position/head bases."""
    round_off = []
    bucket_off = []  # per round: {exp: position offset within the plan}
    head_off = []    # per round: {exp: head index offset within the round}
    total = 0
    for row in buckets:
        round_off.append(total)
        bo, ho = {}, {}
        h_acc = 0
        for e, p in row:
            bo[e] = total
            ho[e] = h_acc
            total += (1 << e) * p
            h_acc += p
        bucket_off.append(bo)
        head_off.append(ho)
    hp = [sum(p for _e, p in row) for row in buckets]
    return round_off, bucket_off, head_off, hp, total


def build_stride_plan(
    tree: SegmentTree, sigma: float, native: bool = True, lean: bool = True
) -> StridePlan:
    """Emit the stride-bucket plan (host NumPy arrays).

    ``native=True`` runs the C++ emitter (``gsm_sb_plan_*``, the streaming
    host hot path); ``native=False`` is the bit-exact vectorized-NumPy
    oracle. Both share the registry-converged layout. ``lean=True`` (the
    production default) emits the round-5 transport format: no inv_perm
    section, dist-only codes, nibble-packed flags (see the class doc).
    """
    n = tree.num_nodes
    if native:
        ints, codes, buckets, n_real, total = _emit_native(tree)
    else:
        light_depth, head_of, depth_in_path = _decompose(tree)
        heads = np.flatnonzero(head_of == np.arange(n))
        path_len = np.bincount(head_of, minlength=n)[heads]
        head_round = light_depth[heads]
        buckets, n_real, exp_of = _layout_from_heads(n, head_round, path_len)
        round_off, bucket_off, head_off, hp, total = _layout_offsets(buckets)
        ints, codes = _emit_numpy(
            tree, buckets, round_off, bucket_off, head_off, hp, total,
            light_depth, head_of, depth_in_path,
            heads, path_len, head_round, exp_of,
        )
    # Compress the perm section: heads + 2-bit heavy-chain residuals (the
    # converter is emitter-agnostic, so C++ and NumPy emissions stay
    # bitwise-comparable end to end).
    head_vals, res = _compress_perm(ints[:total], buckets, tree.width, n)
    pack = _pack24_native if native else pack_ints24
    if lean:
        # Drop the inv_perm(N) section (recomputed in-graph from the
        # decoded perm) and nibble-pack the 3-bit flags two-per-byte.
        ints_c = np.concatenate(
            [head_vals, ints[total + n :]]
        ).astype(np.int32)
        return StridePlan(
            num_nodes=n, total_pos=total, buckets=buckets, n_real=n_real,
            ints=pack(ints_c), codes=np.ascontiguousarray(codes[0]),
            table=weight_lut(sigma), res=res, width=tree.width,
            flg=_pack_flags(codes[1]),
        )
    ints_c = np.concatenate([head_vals, ints[total:]]).astype(np.int32)
    return StridePlan(
        num_nodes=n, total_pos=total, buckets=buckets, n_real=n_real,
        ints=pack(ints_c), codes=codes, table=weight_lut(sigma),
        res=res, width=tree.width,
    )


def _pack_flags(flags: np.ndarray) -> np.ndarray:
    """Nibble-pack the (total,) 3-bit flags stream, two per byte."""
    f = np.asarray(flags, np.uint8)
    if f.max(initial=0) > 0xF:
        raise AssertionError("flags exceed one nibble")
    pad = (-len(f)) % 2
    f = np.concatenate([f, np.zeros(pad, np.uint8)])
    return (f[0::2] | (f[1::2] << 4)).astype(np.uint8)


def _emit_numpy(
    tree, buckets, round_off, bucket_off, head_off, hp, total,
    light_depth, head_of, depth_in_path,
    heads, path_len, head_round, exp_of,
):
    n = tree.num_nodes
    parent = tree.parent.astype(np.int64)

    # Path slot per head: within (round, exp), order by head node id
    # (deterministic; the up-pass reorders by parent position anyway).
    slot_of_head = np.empty(len(heads), np.int64)
    order = np.lexsort((heads, exp_of, head_round))
    hs = heads[order]
    key_r = head_round[order]
    key_e = exp_of[order]
    newgrp = np.ones(len(hs), bool)
    newgrp[1:] = (key_r[1:] != key_r[:-1]) | (key_e[1:] != key_e[:-1])
    grp_start = np.maximum.accumulate(
        np.where(newgrp, np.arange(len(hs)), 0)
    )
    slot_sorted = np.arange(len(hs)) - grp_start
    slot_of_head[order] = slot_sorted

    head_slot = np.zeros(n, np.int64)   # per node: its path's slot
    head_exp = np.zeros(n, np.int64)    # per node: its path's exponent
    head_slot[heads] = slot_of_head
    head_exp[heads] = exp_of
    head_slot = head_slot[head_of]
    head_exp = head_exp[head_of]

    # Position of every node: bucket base + j·P + slot.
    r_of = light_depth
    p_caps = np.zeros((len(buckets), max(
        (max((e for e, _p in row), default=0) for row in buckets), default=0
    ) + 1), np.int64)
    b_offs = np.zeros_like(p_caps)
    for t, row in enumerate(buckets):
        for e, p in row:
            p_caps[t, e] = p
            b_offs[t, e] = bucket_off[t][e]
    pos_of = (
        b_offs[r_of, head_exp]
        + depth_in_path * p_caps[r_of, head_exp]
        + head_slot
    )

    perm = np.full(total, n, np.int64)
    perm[pos_of] = np.arange(n)
    inv_perm = pos_of

    # Parent positions per head (bucket order), light counts per position.
    parent_pos_node = np.where(np.arange(n) == 0, total, pos_of[parent])
    # Light-child count per plan position: every non-root head is the
    # light child of its parent's position.
    cnt = np.bincount(
        parent_pos_node[heads[heads != 0]], minlength=total + 1
    )[:total]
    if cnt.max(initial=0) > 3:
        raise AssertionError("grid node with > 3 light children")

    codes = np.zeros((2, total), np.uint8)
    real = perm != n
    codes[0, real] = tree.parent_dist[perm[real]].astype(np.uint8)
    zero_w = ~real
    zero_w[pos_of[0]] = True  # the root carries no parent edge
    codes[1] = (zero_w + 2 * cnt).astype(np.uint8)

    # Per-round head streams.
    h_offs = np.zeros_like(p_caps)
    for t, row in enumerate(buckets):
        for e, _p in row:
            h_offs[t, e] = head_off[t][e]
    stream_parts = [perm, inv_perm]
    for t, row in enumerate(buckets):
        h_t = hp[t]
        if h_t == 0:
            continue
        parent_pos = np.full(h_t, total, np.int64)
        is_real = np.zeros(h_t, bool)
        sel = head_round == t
        hsel = heads[sel]
        idx_in_round = h_offs[t, exp_of[sel]] + slot_of_head[sel]
        parent_pos[idx_in_round] = parent_pos_node[hsel]
        is_real[idx_in_round] = True
        # head_perm: real heads sorted by (parent position, head index)
        # first — sibling runs become adjacent for the prefix-sum trick —
        # dummies at the tail pointing past the raw array (a zero row).
        real_idx = np.flatnonzero(is_real)
        order = real_idx[np.lexsort((real_idx, parent_pos[real_idx]))]
        head_perm = np.concatenate(
            [order, np.full(h_t - len(order), h_t, np.int64)]
        )
        stream_parts += [parent_pos, head_perm]

    ints = np.concatenate(stream_parts).astype(np.int32)
    return ints, codes


def _pack24_native(ints: np.ndarray) -> np.ndarray:
    """C++ 24-bit packing, bit-identical to :func:`tree.hpd.pack_ints24`
    (~7× faster — the NumPy stack/shift chain costs ~14 ms at Middlebury
    plan sizes, a real slice of the streaming host budget)."""
    import ctypes

    from gpu_stereo_matching_tpu.tree.builder import _lib

    lib = _lib()
    src = np.ascontiguousarray(ints, np.int32)
    out = np.empty((3, src.size), np.uint8)
    rc = lib.gsm_pack24(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(src.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(
            "plan index stream outside the 24-bit packing range"
        )
    return out


def _emit_native(tree: SegmentTree):
    """One-shot C++ emission (see ``gsm_sb_plan_*`` in segment_tree.cpp).

    The C++ core recomputes the heavy-path decomposition in one BFS pass
    (the NumPy pointer-doubling twin costs ~70 ms/frame at Middlebury
    size); Python keeps only the registry-converged layout math.
    """
    import ctypes

    from gpu_stereo_matching_tpu.tree.builder import _lib

    lib = _lib()
    n = tree.num_nodes
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    def p32(a):
        return np.ascontiguousarray(a, np.int32).ctypes.data_as(i32p)

    handle = ctypes.c_void_p(
        lib.gsm_sb_ctx_new(
            n, p32(tree.parent), p32(tree.subtree_size), p32(tree.bfs_order)
        )
    )
    try:
        nh = lib.gsm_sb_num_heads(handle)
        head_node = np.empty(nh, np.int32)
        head_round = np.empty(nh, np.int32)
        path_len = np.empty(nh, np.int32)
        lib.gsm_sb_head_info(
            handle, p32(head_node), head_round.ctypes.data_as(i32p),
            path_len.ctypes.data_as(i32p),
        )
        buckets, n_real, _exp = _layout_from_heads(
            n, head_round.astype(np.int64), path_len.astype(np.int64)
        )
        _ro, _bo, _ho, hp, total = _layout_offsets(buckets)
        n_exp = max(
            (max((e for e, _p in row), default=0) for row in buckets),
            default=0,
        ) + 1
        caps = np.zeros((len(buckets), n_exp), np.int32)
        for t, row in enumerate(buckets):
            for e, p in row:
                caps[t, e] = p
        n_streams = sum(2 * h for h in hp if h > 0)
        ints = np.empty(total + n + n_streams, np.int32)
        codes = np.empty((2, total), np.uint8)
        rc = lib.gsm_sb_plan_fill(
            handle, len(buckets), n_exp,
            caps.ctypes.data_as(i32p), p32(tree.parent_dist),
            ints.ctypes.data_as(i32p),
            codes.ctypes.data_as(u8p),
        )
        if rc != 0:
            raise RuntimeError(f"gsm_sb_plan_fill failed (code {rc})")
    finally:
        lib.gsm_hpd_plan_free(handle)
    return ints, codes, buckets, n_real, total


def _compress_perm(perm: np.ndarray, buckets, width: int, n: int):
    """Host side: perm(total) → (heads(H_all), 2-bit residual codes).

    Within a bucket column, row j's node is row j−1's heavy child — a
    4-connected grid neighbor — so the step ``perm[j] − perm[j−1]`` is one
    of {+W, +1, −1, −W}; pad rows (value n) get code 0 and are masked by
    the decoder via the codes zero-weight flag. Exact by construction.
    """
    heads_parts, res_parts = [], []
    off = 0
    for row in buckets:
        for e, p in row:
            s = 1 << e
            blk = perm[off : off + s * p].reshape(s, p)
            heads_parts.append(blk[0])
            if s > 1:
                d = blk[1:].astype(np.int64) - blk[:-1].astype(np.int64)
                code = np.zeros((s - 1, p), np.uint8)
                code[d == 1] = 1
                code[d == -1] = 2
                code[d == -width] = 3
                real = blk[1:] != n
                ok = (
                    (d == width) | (d == 1) | (d == -1) | (d == -width)
                )
                if not bool(np.all(ok | ~real)):
                    raise AssertionError(
                        "non-neighbor heavy step in perm stream"
                    )
                code[~real] = 0
                res_parts.append(code.reshape(-1))
            off += s * p
    heads = np.concatenate(heads_parts) if heads_parts else np.zeros(0)
    res = (
        np.concatenate(res_parts) if res_parts else np.zeros(0, np.uint8)
    )
    pad = (-len(res)) % 4
    res = np.concatenate([res, np.zeros(pad, np.uint8)])
    packed = (
        res[0::4] | (res[1::4] << 2) | (res[2::4] << 4) | (res[3::4] << 6)
    ).astype(np.uint8)
    return heads.astype(np.int64), packed


def _decode_perm(heads, res_packed, codes_zero, plan: StridePlan):
    """In-graph inverse of :func:`_compress_perm` → (total,) i32 perm."""
    n, w = plan.num_nodes, plan.width
    b = res_packed.astype(jnp.int32)
    codes4 = jnp.stack(
        [b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3], axis=-1
    ).reshape(-1)
    # code -> step, branch-free: {0:+W, 1:+1, 2:-1, 3:-W}
    steps_all = jnp.where(
        codes4 == 0, w,
        jnp.where(codes4 == 1, 1, jnp.where(codes4 == 2, -1, -w)),
    )
    parts = []
    off = 0       # position offset (for the pad mask)
    hoff = 0      # heads offset
    roff = 0      # residual offset
    for row in plan.buckets:
        for e, p in row:
            s = 1 << e
            head = heads[hoff : hoff + p]
            if s == 1:
                parts.append(head)
            else:
                st = steps_all[roff : roff + (s - 1) * p].reshape(s - 1, p)
                col = head[None, :] + jnp.cumsum(st, axis=0)
                blk = jnp.concatenate([head[None, :], col], axis=0)
                pad = codes_zero[off : off + s * p].reshape(s, p)
                # rows >= 1: zero-weight <=> padding (the root is a head)
                blk = jnp.where(
                    pad & (jax.lax.broadcasted_iota(
                        jnp.int32, (s, p), 0) > 0),
                    n, blk,
                )
                parts.append(blk.reshape(-1))
                roff += (s - 1) * p
            hoff += p
            off += s * p
    return jnp.concatenate(parts)


def _unpack_sb_ints(ints, plan: StridePlan):
    total, n = plan.total_pos, plan.num_nodes
    if plan.res is not None:
        h_all = sum(p for row in plan.buckets for _e, p in row)
        heads = ints[:h_all]
        if plan.flg is not None:
            # Lean layout: no inv_perm section (recomputed in-graph).
            inv_perm = None
            off = h_all
        else:
            inv_perm = ints[h_all : h_all + n]
            off = h_all + n
        head_streams = []
        for row in plan.buckets:
            h_t = sum(p for _e, p in row)
            if h_t == 0:
                head_streams.append((None, None))
                continue
            head_streams.append(
                (ints[off : off + h_t], ints[off + h_t : off + 2 * h_t])
            )
            off += 2 * h_t
        return heads, inv_perm, head_streams
    perm = ints[:total]
    inv_perm = ints[total : total + n]
    off = total + n
    head_streams = []
    for row in plan.buckets:
        h_t = sum(p for _e, p in row)
        if h_t == 0:
            head_streams.append((None, None))
            continue
        head_streams.append(
            (ints[off : off + h_t], ints[off + h_t : off + 2 * h_t])
        )
        off += 2 * h_t
    return perm, inv_perm, head_streams


def _invert_perm(perm: jnp.ndarray, n: int) -> jnp.ndarray:
    """In-graph inverse of the (total,) position→node map → (N,) i32.

    Real perm entries are a permutation of 0..N−1; pads carry value N.
    ``argsort`` (default): pads sort past every real value, so the first
    N entries of the stable argsort ARE inv_perm. ``scatter``: one
    drop-mode scatter of position ids (pads out of bounds → dropped).
    Both produce identical exact integers; the default is chosen by the
    round-5 on-hardware A/B (tools/exp_inv_perm.py).
    """
    if _INV_METHOD == "scatter":
        iota = jnp.arange(perm.shape[0], dtype=jnp.int32)
        return jnp.zeros((n,), jnp.int32).at[perm].set(iota, mode="drop")
    return jnp.argsort(perm)[:n].astype(jnp.int32)


# Round-5 finding (tools/exp_gather_payload.py, v5e): XLA's f32 row
# gather costs ~10 ns/row REGARDLESS of row width (32/64/128 f32 all
# measure the same — per-row, not per-byte), and on a standalone
# materialized table a 16-bit-element gather is ~5.5x cheaper
# (1.8 ns/row). BUT embedded in the filter graph the u16-view gather is
# ~2.3x SLOWER (tools/exp_hd_ab.py: 103 → 236 ms/frame at HD) — the
# bitcast/reshape fuses into the gather and changes its lowering. Modes:
# "0" plain f32 gathers (default), "1" u16 view, "barrier" u16 view
# behind an optimization_barrier (forces the view to materialize, the
# condition the microbenchmark measured). Kept as an env knob + tools
# for future re-evaluation; all modes are bit-exact.
_FAST_GATHER = os.environ.get("GSM_SB_FASTGATHER", "0")


def _row_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` for (R, D) f32 rows (see _FAST_GATHER modes)."""
    if (
        _FAST_GATHER not in ("1", "barrier")
        or table.dtype != jnp.float32
        or table.ndim != 2
    ):
        return table[idx]
    n, d = table.shape
    view = jax.lax.bitcast_convert_type(table, jnp.uint16).reshape(n, 2 * d)
    if _FAST_GATHER == "barrier":
        view = jax.lax.optimization_barrier(view)
    g = view[idx]
    return jax.lax.bitcast_convert_type(
        g.reshape(g.shape[0], d, 2), jnp.float32
    )


def _scan_affine(a, b, steps: int, reverse: bool):
    """Per-bucket Hillis–Steele affine scan along axis 0 of (S, P, D).

    Identical recurrence and step order to ``tree.hpd._seg_scan``; no
    boundary masking is needed because paths occupy disjoint columns.
    """
    dt = b.dtype
    for k in range(steps):
        sh = 1 << k
        if sh >= b.shape[0]:
            break
        pad_a = jnp.ones((sh,) + a.shape[1:], dt)
        pad_b = jnp.zeros((sh,) + b.shape[1:], dt)
        if reverse:
            a_sh = jnp.concatenate([a[sh:], pad_a], axis=0)
            b_sh = jnp.concatenate([b[sh:], pad_b], axis=0)
        else:
            a_sh = jnp.concatenate([pad_a, a[:-sh]], axis=0)
            b_sh = jnp.concatenate([pad_b, b[:-sh]], axis=0)
        b = b + a * b_sh
        a = a * a_sh
    return b


def tree_filter_nodes_sb(
    cost_nodes: jnp.ndarray, plan: StridePlan
) -> jnp.ndarray:
    """Exact (N, D) non-local aggregation from a stride-bucket plan.

    Matches :func:`tree.hpd.tree_filter_nodes_po` (and therefore the
    reference filter) to float tolerance: per-path scan step order is
    identical, but sibling light contributions are pre-summed pairwise
    ((h1+h2)+h3 instead of ((b+h1)+h2)+h3) and bucket scans stop at the
    bucket's own log2(S) instead of the round maximum.
    """
    d = cost_nodes.shape[1]
    dt = cost_nodes.dtype
    total = plan.total_pos
    ints = plan.ints
    if ints.ndim == 2 and ints.dtype == jnp.uint8:
        ints = _unpack_ints24(ints)
    first, inv_perm, head_streams = _unpack_sb_ints(ints, plan)

    if plan.flg is not None:
        # Lean layout: (total,) dist codes + nibble-packed flags.
        dist_codes = plan.codes
        fb = plan.flg.astype(jnp.int32)
        flags = jnp.stack([fb & 0xF, fb >> 4], axis=-1).reshape(-1)[:total]
    else:
        dist_codes = plan.codes[0]
        flags = plan.codes[1].astype(jnp.int32)
    vals = _exact_lut(dist_codes, plan.table)
    zero = (flags & 1) != 0
    w = jnp.where(zero, jnp.zeros_like(vals[:, 0]), vals[:, 0])
    omw2 = jnp.where(zero, jnp.ones_like(vals[:, 1]), vals[:, 1])
    cnt = (flags >> 1) & 3

    if plan.res is not None:
        perm = _decode_perm(first, plan.res, zero, plan)
    else:
        perm = first
    if inv_perm is None:
        inv_perm = _invert_perm(perm, plan.num_nodes)
    cost_ext = jnp.concatenate([cost_nodes, jnp.zeros((1, d), dt)], axis=0)
    cost_plan = _row_gather(cost_ext, perm)

    live = list(range(min(plan.n_real if plan.n_real >= 0 else len(
        plan.buckets), len(plan.buckets))))
    round_off = []
    off = 0
    for row in plan.buckets:
        round_off.append(off)
        off += sum((1 << e) * p for e, p in row)
    hp = [sum(p for _e, p in row) for row in plan.buckets]

    # ---- Up pass (leaf-most round first) -------------------------------
    s_blocks: dict = {}   # round -> list of (S, P, D) scanned blocks
    ws_heads: dict = {}   # round -> (H_t, D) w·s at heads, bucket order
    for t in reversed(live):
        off_t = round_off[t]
        l_t = sum((1 << e) * p for e, p in plan.buckets[t])
        b_t = jax.lax.slice_in_dim(cost_plan, off_t, off_t + l_t, axis=0)

        nxt = t + 1
        if nxt < len(plan.buckets) and nxt in ws_heads and hp[nxt] > 0:
            h_nx = hp[nxt]
            _pp, head_perm = head_streams[nxt]
            raw_ext = jnp.concatenate(
                [ws_heads[nxt], jnp.zeros((1, d), dt)], axis=0
            )
            h1 = _row_gather(raw_ext, head_perm)  # by (parent pos, rank)
            z1 = jnp.zeros((1, d), dt)
            # Sibling prefix sums via shifted adds; the pad keeps every
            # shift exactly H rows (h1[k:] alone under-fills when H < k).
            h1p = jnp.concatenate([h1, z1, z1], axis=0)
            h2 = h1 + h1p[1 : h_nx + 1]
            h3 = h2 + h1p[2 : h_nx + 2]
            stacked = jnp.concatenate([h1, h2, h3, z1], axis=0)
            cnt_t = jax.lax.slice_in_dim(cnt, off_t, off_t + l_t, axis=0)
            base = jnp.cumsum(cnt_t) - cnt_t
            idx = jnp.where(cnt_t > 0, base + h_nx * (cnt_t - 1), 3 * h_nx)
            b_t = b_t + _row_gather(stacked, idx)

        blocks, heads_t = [], []
        bo = 0
        for e, p in plan.buckets[t]:
            s_e = 1 << e
            blk = jax.lax.slice_in_dim(
                b_t, bo, bo + s_e * p, axis=0
            ).reshape(s_e, p, d)
            w_blk = jax.lax.slice_in_dim(
                w, off_t + bo, off_t + bo + s_e * p, axis=0
            ).reshape(s_e, p)
            a_blk = jnp.concatenate(
                [w_blk[1:], jnp.zeros((1, p), dt)], axis=0
            )[:, :, None]
            s_blk = _scan_affine(a_blk, blk, e, reverse=True)
            blocks.append((e, p, s_blk, w_blk))
            heads_t.append(w_blk[0][:, None] * s_blk[0])
            bo += s_e * p
        s_blocks[t] = blocks
        ws_heads[t] = (
            jnp.concatenate(heads_t, axis=0) if heads_t
            else jnp.zeros((0, d), dt)
        )

    # ---- Down pass (root round first) ----------------------------------
    f_buf = jnp.zeros((total + 1, d), dt)
    for t in live:
        off_t = round_off[t]
        parent_pos, _hperm = head_streams[t]
        fp = (
            _row_gather(f_buf, parent_pos)
            if parent_pos is not None else None
        )
        f_parts = []
        bo = 0
        h_acc = 0
        for e, p, s_blk, w_blk in s_blocks[t]:
            s_e = 1 << e
            omw2_blk = jax.lax.slice_in_dim(
                omw2, off_t + bo, off_t + bo + s_e * p, axis=0
            ).reshape(s_e, p)
            b_blk = omw2_blk[:, :, None] * s_blk
            row0 = b_blk[0]
            if fp is not None:
                row0 = row0 + w_blk[0][:, None] * jax.lax.slice_in_dim(
                    fp, h_acc, h_acc + p, axis=0
                )
            b_blk = jnp.concatenate([row0[None], b_blk[1:]], axis=0)
            a_blk = jnp.concatenate(
                [jnp.zeros((1, p), dt), w_blk[1:]], axis=0
            )[:, :, None]
            f_blk = _scan_affine(a_blk, b_blk, e, reverse=False)
            f_parts.append(f_blk.reshape(s_e * p, d))
            bo += s_e * p
            h_acc += p
        if f_parts:
            f_buf = jax.lax.dynamic_update_slice(
                f_buf, jnp.concatenate(f_parts, axis=0), (off_t, 0)
            )

    return _row_gather(f_buf, inv_perm)


def stack_stride_plans(plans) -> StridePlan:
    """Stack same-layout stride plans (shared table, batched ints/codes)."""
    p0 = plans[0]
    for p in plans[1:]:
        if p.layout_key != p0.layout_key:
            raise ValueError(
                "plan layouts diverged; rebuild until layout_keys agree"
            )
        if not np.array_equal(np.asarray(p.table), np.asarray(p0.table)):
            raise ValueError("stride plans must share one weight table (σ)")
    xp = np if all(isinstance(p.ints, np.ndarray) for p in plans) else jnp
    ints = xp.stack([p.ints for p in plans])
    codes = xp.stack([p.codes for p in plans])
    res = None if p0.res is None else xp.stack([p.res for p in plans])
    flg = None if p0.flg is None else xp.stack([p.flg for p in plans])
    return StridePlan(
        p0.num_nodes, p0.total_pos, p0.buckets, p0.n_real,
        ints, codes, p0.table, res=res, width=p0.width, flg=flg,
    )


def converged_stride_batch(trees, sigma: float, native: bool = True) -> StridePlan:
    """One stacked stride plan for several same-size trees.

    Building a plan can grow the layout registry (a longer path, a fuller
    bucket), so iterate until every plan reports the same layout key —
    monotone caps bound this at a handful of host-side re-emissions.
    """
    plans = [
        StridePlan.from_tree(t, sigma, native=native, device=False)
        for t in trees
    ]
    for _ in range(8):
        if len({p.layout_key for p in plans}) == 1:
            return stack_stride_plans(plans)
        plans = [
            StridePlan.from_tree(t, sigma, native=native, device=False)
            for t in trees
        ]
    raise RuntimeError("plan layouts failed to converge")  # pragma: no cover

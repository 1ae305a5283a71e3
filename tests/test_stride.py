"""Stride-bucket plan emitter + filter vs the plan-order/sequential oracles.

The stride filter (tree/stride.py) is the production ST aggregation path;
its results match the plan-order filter — and therefore the sequential
reference filter ``STMatching/SegmentTree.cpp:148-181`` — to float
tolerance (per-path scan order is identical; sibling light contributions
are pre-summed pairwise and bucket scans stop at the bucket's own log2(S),
so last-ulp association differs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_stereo_matching_tpu.tree.builder import build_segment_tree, grid_edges
from gpu_stereo_matching_tpu.tree.hpd import (
    PlanOrderPlan,
    tree_filter_nodes_po,
)
from gpu_stereo_matching_tpu.tree.stride import (
    StridePlan,
    build_stride_plan,
    converged_stride_batch,
    stack_stride_plans,
    tree_filter_nodes_sb,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _tree(rng, h, w):
    ea, _eb = grid_edges(h, w)
    weights = (rng.random(len(ea)) * 60).astype(np.float32)
    return build_segment_tree(weights, h, w, tau=100.0, min_size=6,
                              penalty=5.0)


class TestStrideFilter:
    @pytest.mark.parametrize("hw", [(7, 9), (16, 21), (1, 8), (8, 1),
                                    (23, 17)])
    def test_matches_plan_order_filter(self, rng, hw):
        h, w = hw
        tree = _tree(rng, h, w)
        cost = rng.random((h * w, 6)).astype(np.float32)
        want = np.asarray(
            tree_filter_nodes_po(
                jnp.asarray(cost), PlanOrderPlan.from_tree(tree, 0.1)
            )
        )
        got = np.asarray(
            tree_filter_nodes_sb(
                jnp.asarray(cost), StridePlan.from_tree(tree, 0.1)
            )
        )
        np.testing.assert_allclose(got, want, rtol=3e-6, atol=3e-6)

    def test_matches_sequential_oracle(self, rng):
        """Float64 sequential two-pass recurrence (the reference form)."""
        h, w = 13, 11
        tree = _tree(rng, h, w)
        n = h * w
        cost = rng.random((n, 3)).astype(np.float32)
        wts = tree.parent_weights(0.1).astype(np.float64)
        wts[0] = 0.0
        s = cost.astype(np.float64).copy()
        for v in tree.bfs_order[::-1]:
            if v != 0:
                s[tree.parent[v]] += wts[v] * s[v]
        f = np.zeros_like(s)
        for v in tree.bfs_order:
            if v == 0:
                f[v] = s[v]
            else:
                p, wv = tree.parent[v], wts[v]
                f[v] = wv * (f[p] - wv * s[v]) + s[v]
        got = np.asarray(
            tree_filter_nodes_sb(
                jnp.asarray(cost), StridePlan.from_tree(tree, 0.1)
            )
        )
        np.testing.assert_allclose(got, f, rtol=2e-5, atol=2e-5)

    def test_native_emitter_matches_numpy_bitwise(self, rng):
        for hw in [(7, 9), (16, 21), (3, 25)]:
            tree = _tree(rng, *hw)
            a = build_stride_plan(tree, 0.1, native=False)
            b = build_stride_plan(tree, 0.1, native=True)
            assert a.layout_key == b.layout_key
            np.testing.assert_array_equal(
                np.asarray(a.ints), np.asarray(b.ints)
            )
            np.testing.assert_array_equal(
                np.asarray(a.codes), np.asarray(b.codes)
            )
            np.testing.assert_array_equal(
                np.asarray(a.table), np.asarray(b.table)
            )

    def test_stacked_batch_matches_single(self, rng):
        h, w = 11, 13
        trees = [_tree(rng, h, w) for _ in range(3)]
        costs = rng.random((3, h * w, 5)).astype(np.float32)
        stacked = converged_stride_batch(trees, 0.1)
        dev = stacked.to_device()
        batched = np.asarray(
            jnp.stack([
                tree_filter_nodes_sb(jnp.asarray(costs[i]), dev.frame(i))
                for i in range(3)
            ])
        )
        for i, t in enumerate(trees):
            single = np.asarray(
                tree_filter_nodes_sb(
                    jnp.asarray(costs[i]), StridePlan.from_tree(t, 0.1)
                )
            )
            np.testing.assert_array_equal(batched[i], single)

    def test_stack_rejects_diverged_layouts(self, rng):
        t1 = _tree(rng, 9, 9)
        t2 = _tree(rng, 9, 10)  # different N -> different layout
        p1 = StridePlan.from_tree(t1, 0.1, device=False)
        p2 = StridePlan.from_tree(t2, 0.1, device=False)
        with pytest.raises(ValueError):
            stack_stride_plans([p1, p2])

    def test_perm_compression_roundtrip_bitwise(self, rng):
        """2-bit heavy-chain residuals decode to the raw perm exactly."""
        from gpu_stereo_matching_tpu.tree.stride import (
            _compress_perm,
            _decode_perm,
            _emit_native,
            _pack24_native,
            weight_lut,
        )

        for hw in [(7, 9), (16, 21), (8, 1), (1, 8), (23, 17)]:
            h, w = hw
            tree = _tree(rng, h, w)
            n = tree.num_nodes
            ints_raw, codes, buckets, n_real, total = _emit_native(tree)
            perm_raw = ints_raw[:total]
            heads, res = _compress_perm(perm_raw, buckets, w, n)
            plan = StridePlan(
                n, total, buckets, n_real,
                jnp.asarray(_pack24_native(np.concatenate(
                    [heads, ints_raw[total:]]).astype(np.int32))),
                jnp.asarray(codes), jnp.asarray(weight_lut(0.1)),
                res=jnp.asarray(res), width=w,
            )
            zero = (jnp.asarray(codes[1]).astype(jnp.int32) & 1) != 0
            dec = np.asarray(
                _decode_perm(
                    jnp.asarray(heads.astype(np.int32)),
                    jnp.asarray(res), zero, plan,
                )
            )
            np.testing.assert_array_equal(dec, perm_raw)

    @pytest.mark.parametrize("inv_method", ["argsort", "scatter"])
    def test_lean_transport_bitwise(self, rng, inv_method, monkeypatch):
        """Round-5 lean format (no inv_perm shipped, nibble-packed flags)
        filters bit-identically to the legacy format, for both in-graph
        inversion methods."""
        import gpu_stereo_matching_tpu.tree.stride as stride_mod

        monkeypatch.setattr(stride_mod, "_INV_METHOD", inv_method)
        for hw in [(7, 9), (16, 21), (1, 8), (8, 1), (23, 17)]:
            tree = _tree(rng, *hw)
            cost = rng.random((hw[0] * hw[1], 5)).astype(np.float32)
            legacy = StridePlan.from_tree(tree, 0.1, lean=False)
            lean = StridePlan.from_tree(tree, 0.1, lean=True)
            assert lean.flg is not None and lean.res is not None
            assert lean.transport_nbytes < legacy.transport_nbytes
            want = np.asarray(
                tree_filter_nodes_sb(jnp.asarray(cost), legacy)
            )
            got = np.asarray(tree_filter_nodes_sb(jnp.asarray(cost), lean))
            np.testing.assert_array_equal(got, want)

    def test_lean_flag_nibble_roundtrip(self, rng):
        """Packed flags decode to the legacy codes[1] stream exactly."""
        tree = _tree(rng, 13, 17)
        legacy = StridePlan.from_tree(tree, 0.1, device=False, lean=False)
        lean = StridePlan.from_tree(tree, 0.1, device=False, lean=True)
        fb = np.asarray(lean.flg).astype(np.int64)
        unpacked = np.stack([fb & 0xF, fb >> 4], axis=-1).reshape(-1)
        np.testing.assert_array_equal(
            unpacked[: lean.total_pos], np.asarray(legacy.codes[1])
        )
        np.testing.assert_array_equal(
            np.asarray(lean.codes), np.asarray(legacy.codes[0])
        )

    def test_light_counts_and_flags(self, rng):
        """Codes carry light counts <= 3 and zero-weight only on pad/root."""
        tree = _tree(rng, 12, 14)
        plan = StridePlan.from_tree(tree, 0.1, device=False, lean=False)
        flags = np.asarray(plan.codes[1]).astype(int)
        cnt = (flags >> 1) & 3
        n_paths_nonroot = cnt.sum()
        # every non-root path head is someone's light child, exactly once
        from gpu_stereo_matching_tpu.tree.stride import _decompose

        _ld, head_of, _dip = _decompose(tree)
        heads = np.flatnonzero(head_of == np.arange(tree.num_nodes))
        assert n_paths_nonroot == len(heads) - 1
        assert cnt.max() <= 3

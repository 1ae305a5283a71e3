"""NumPy golden-reference implementations of every pipeline stage.

These are deliberately naive (per-pixel loops, no shared code with the JAX
ops) and serve as the test oracles — the same validation pattern the
reference wires into its demo binaries as CPU twins + element-wise
comparators (``BlockMatching/BlockMatching.cpp:263-308``), promoted to a
real test suite.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- color/gray


def gray_oracle(img: np.ndarray, weights, rounding: str = "half_up") -> np.ndarray:
    h, w, _ = img.shape
    out = np.zeros((h, w), np.uint8)
    for y in range(h):
        for x in range(w):
            s = sum(float(wt) * float(img[y, x, c]) for c, wt in enumerate(weights))
            if rounding == "half_up":
                v = np.floor(s + 0.5)
            else:
                v = np.rint(s)  # round-half-even
            out[y, x] = np.uint8(min(max(v, 0.0), 255.0))
    return out


def gradient_x_oracle(gray: np.ndarray) -> np.ndarray:
    h, w = gray.shape
    g = gray.astype(np.float32)
    out = np.zeros((h, w), np.float32)
    for y in range(h):
        out[y, 0] = g[y, 1] - g[y, 0] + 127.5
        for x in range(1, w - 1):
            out[y, x] = 0.5 * (g[y, x + 1] - g[y, x - 1]) + 127.5
        out[y, w - 1] = g[y, w - 1] - g[y, w - 2] + 127.5
    return out


# -------------------------------------------------------------- cost volumes


def ad_cost_volume_oracle(left: np.ndarray, right: np.ndarray, num_disp: int,
                          invalid: int = 255) -> np.ndarray:
    h, w = left.shape
    vol = np.full((num_disp, h, w), invalid, np.uint8)
    for d in range(num_disp):
        for y in range(h):
            for x in range(w):
                if x - d >= 0:
                    vol[d, y, x] = abs(int(left[y, x]) - int(right[y, x - d]))
    return vol


def color_grad_cost_volume_oracle(
    left_bgr: np.ndarray,
    right_bgr: np.ndarray,
    num_disp: int,
    tau_color: float = 7.0,
    tau_grad: float = 2.0,
    alpha: float = 0.11,
) -> np.ndarray:
    h, w, _ = left_bgr.shape
    gl = gray_oracle(left_bgr, (0.114, 0.587, 0.299))
    gr = gray_oracle(right_bgr, (0.114, 0.587, 0.299))
    gradl = gradient_x_oracle(gl)
    gradr = gradient_x_oracle(gr)
    vol = np.zeros((num_disp, h, w), np.float32)
    for d in range(num_disp):
        for y in range(h):
            for x in range(w):
                xs = max(x - d, 0)  # left-edge replicate
                cc = 0.0
                for c in range(3):
                    cc += abs(int(left_bgr[y, x, c]) - int(right_bgr[y, xs, c]))
                cc = min(cc / 3.0, tau_color)
                cg = min(abs(float(gradl[y, x]) - float(gradr[y, xs])), tau_grad)
                vol[d, y, x] = np.float32(alpha * cc + (1.0 - alpha) * cg)
    return vol


def right_cost_from_left_oracle(cost_left: np.ndarray) -> np.ndarray:
    num_d, h, w = cost_left.shape
    out = np.zeros_like(cost_left)
    for d in range(num_d):
        for y in range(h):
            for x in range(w):
                if x + d < w:
                    out[d, y, x] = cost_left[d, y, x + d]
                else:
                    out[d, y, x] = out[d - 1, y, x]
    return out


# -------------------------------------------------------------- aggregation


def box_sum_oracle(x: np.ndarray, radius: int) -> np.ndarray:
    """Clipped-window (2r+1)² sum over the last two axes, exact int64."""
    h, w = x.shape[-2:]
    xi = x.astype(np.int64) if np.issubdtype(x.dtype, np.integer) else x
    out = np.zeros_like(xi)
    for y in range(h):
        y0, y1 = max(y - radius, 0), min(y + radius, h - 1)
        for xx in range(w):
            x0, x1 = max(xx - radius, 0), min(xx + radius, w - 1)
            out[..., y, xx] = xi[..., y0 : y1 + 1, x0 : x1 + 1].sum(axis=(-2, -1))
    return out


def wta_oracle(cost: np.ndarray) -> np.ndarray:
    num_d, h, w = cost.shape
    out = np.zeros((h, w), np.int32)
    for y in range(h):
        for x in range(w):
            best, bd = None, 0
            for d in range(num_d):
                v = cost[d, y, x]
                if best is None or v < best:
                    best, bd = v, d
            out[y, x] = bd
    return out


# ------------------------------------------------------------ post-process


def lr_mask_oracle(disp_l: np.ndarray, disp_r: np.ndarray, max_diff: int = 1) -> np.ndarray:
    h, w = disp_l.shape
    mask = np.zeros((h, w), bool)
    for y in range(h):
        for x in range(w):
            d = int(disp_l[y, x])
            if d <= 0 or x - d < 0:
                continue
            if abs(d - int(disp_r[y, x - d])) <= max_diff:
                mask[y, x] = True
    return mask


def median_oracle(img: np.ndarray, radius: int) -> np.ndarray:
    """Clipped-window median: smallest v with count(<= v) > n // 2."""
    h, w = img.shape
    out = np.zeros((h, w), np.uint8)
    for y in range(h):
        y0, y1 = max(y - radius, 0), min(y + radius, h - 1)
        for x in range(w):
            x0, x1 = max(x - radius, 0), min(x + radius, w - 1)
            win = np.sort(img[y0 : y1 + 1, x0 : x1 + 1], axis=None)
            out[y, x] = win[len(win) // 2]
    return out


def remap_oracle(src: np.ndarray, map_x: np.ndarray, map_y: np.ndarray) -> np.ndarray:
    h, w = src.shape
    oh, ow = map_x.shape
    out = np.zeros((oh, ow), np.uint8)
    for y in range(oh):
        for x in range(ow):
            sx, sy = float(map_x[y, x]), float(map_y[y, x])
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            if x0 < 0 or y0 < 0 or x0 + 1 > w - 1 or y0 + 1 > h - 1:
                continue
            fx, fy = sx - x0, sy - y0
            top = (1 - fx) * src[y0, x0] + fx * src[y0, x0 + 1]
            bot = (1 - fx) * src[y0 + 1, x0] + fx * src[y0 + 1, x0 + 1]
            v = (1 - fy) * top + fy * bot
            out[y, x] = np.uint8(min(max(np.rint(v), 0.0), 255.0))
    return out


# ------------------------------------------------- segment-tree filter oracle


def tree_filter_oracle(
    cost: np.ndarray,          # (N, D) node-major cost (node id = pixel id)
    bfs_order: np.ndarray,     # (N,) node ids in BFS order from the root
    parent: np.ndarray,        # (N,) parent node id per node (root: itself)
    parent_weight: np.ndarray, # (N,) exp-weight of the edge to the parent
) -> np.ndarray:
    """Two-pass exact non-local tree aggregation (``SegmentTree.cpp:148-181``)."""
    n = cost.shape[0]
    buf = cost.astype(np.float64).copy()
    # leaf → root (children appear after parents in BFS order)
    for i in range(n - 1, 0, -1):
        v = bfs_order[i]
        buf[parent[v]] += parent_weight[v] * buf[v]
    final = np.zeros_like(buf)
    final[bfs_order[0]] = buf[bfs_order[0]]
    # root → leaf
    for i in range(1, n):
        v = bfs_order[i]
        wgt = parent_weight[v]
        final[v] = wgt * (final[parent[v]] - wgt * buf[v]) + buf[v]
    return final.astype(cost.dtype)

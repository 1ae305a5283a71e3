"""Diff the fused BM kernel against the reference's own CPU block matcher.

Compiles ``BlockMatching/BlockMatching.cpp`` (the reference's CPU oracle,
``testBM``, which its CUDA kernels were validated against) with the
``tools/refshim`` cv::Mat shim and a small PGM driver, runs it on the
singleFrame workload (Art quarter-res, 11×11 SAD, 64 disparities,
``Caller.cpp:9-25``) with gray inputs shared with this repo's pipeline,
and diffs disparities.

Comparison semantics: this framework deliberately does NOT replicate the
reference's edge quirks (SURVEY §7 "known quirks"): testBM treats x<d
taps as zero-diff (we: invalid-cost 255), truncates the search near the
right edge (`_col + _search > cols`, an off-by-one), and leaves dm=-256→0
when no window beats the 50·window² init threshold. The diff therefore
checks the INTERIOR (columns [searchRange+radius, W−searchRange)) and
separately verifies that every interior mismatch is the threshold quirk
(reference output 0 with best SAD ≥ 50·(2r+1)²) — i.e. the integer
SAD+WTA arithmetic itself is bit-exact.

Usage: python tools/ref_parity_bm.py
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BM = "/root/reference/BlockMatching"


def _write_backslash_redirects(build_dir: str) -> None:
    """Satisfy the reference's Windows-style ``#include <opencv2\\core\\…>``
    (``BlockMatching.h:4``, ``Caller.h:4``) without checking backslash-named
    files into the repo (git on Windows cannot create them). On Linux, gcc
    treats the backslash as part of the filename, so we generate one-line
    redirect headers with literal-backslash names in the throwaway build
    dir at compile time."""
    for bs_name, target in (
        ("opencv2\\core\\core.hpp", "opencv2/core/core.hpp"),
        ("opencv2\\highgui\\highgui.hpp", "opencv2/highgui/highgui.hpp"),
    ):
        path = os.path.join(build_dir, bs_name)
        line = f'#include "{target}"\n'
        if not (os.path.exists(path) and open(path).read() == line):
            with open(path, "w") as f:
                f.write(line)


def build_bm_binary(build_dir: str) -> str:
    exe = os.path.join(build_dir, "bm_ref")
    srcs = [
        os.path.join(REPO, "tools/refshim/bm_main.cpp"),
        f"{REF_BM}/BlockMatching.cpp",
    ]
    stamp = max(os.path.getmtime(s) for s in srcs + [
        os.path.join(REPO, "tools/refshim/opencv2/core/core.hpp"),
    ])
    if os.path.exists(exe) and os.path.getmtime(exe) >= stamp:
        return exe
    _write_backslash_redirects(build_dir)
    subprocess.run(
        ["g++", "-O2", "-std=c++14", "-I", build_dir,
         "-I", os.path.join(REPO, "tools/refshim"), "-I", REF_BM,
         "-o", exe] + srcs,
        check=True,
    )
    return exe


def _write_pgm(path, a):
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (a.shape[1], a.shape[0]))
        f.write(a.tobytes())


def run_parity(sad_radius: int = 5, search_range: int = 64,
               interpret: bool | None = None) -> dict:
    import jax

    if os.environ.get("GSM_PARITY_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
        if interpret is None:
            interpret = True
    import jax.numpy as jnp
    from PIL import Image

    from gpu_stereo_matching_tpu.kernels.sad_wta import fused_block_matching
    from gpu_stereo_matching_tpu.ops.aggregate import aggregate_cost_volume
    from gpu_stereo_matching_tpu.ops.color import gray_blockmatching_bgr
    from gpu_stereo_matching_tpu.ops.cost import ad_cost_volume

    build_dir = os.path.join(tempfile.gettempdir(), "gsm_refbuild")
    os.makedirs(build_dir, exist_ok=True)
    exe = build_bm_binary(build_dir)

    def load_bgr(p):
        return np.ascontiguousarray(
            np.array(Image.open(p).convert("RGB"))[:, :, ::-1]
        )

    left = load_bgr("/root/reference/Images/Art/view1_.png")
    right = load_bgr("/root/reference/Images/Art/view5_.png")
    gray = jax.jit(gray_blockmatching_bgr)
    gl = np.asarray(gray(jnp.asarray(left)))
    gr = np.asarray(gray(jnp.asarray(right)))
    h, w = gl.shape

    lp, rp, op = (os.path.join(build_dir, n) for n in
                  ("bm_l.pgm", "bm_r.pgm", "bm_d.pgm"))
    _write_pgm(lp, gl)
    _write_pgm(rp, gr)
    subprocess.run(
        [exe, lp, rp, op, str(sad_radius), str(search_range)],
        check=True, capture_output=True, timeout=300,
    )
    ref = np.array(Image.open(op))

    ours = np.asarray(
        fused_block_matching(
            jnp.asarray(gl), jnp.asarray(gr), search_range, sad_radius,
            interpret=bool(interpret),
        )
    ).astype(np.uint8)

    vol = np.asarray(
        jax.jit(
            lambda a, b: aggregate_cost_volume(
                ad_cost_volume(a, b, search_range), sad_radius
            )
        )(jnp.asarray(gl), jnp.asarray(gr))
    )
    best_sad = vol.min(axis=0)

    interior = np.zeros((h, w), bool)
    interior[:, search_range + sad_radius : w - search_range] = True
    bad = (ref != ours) & interior
    thresh = 50 * (2 * sad_radius + 1) ** 2
    quirk = bad & (ref == 0) & (best_sad >= thresh)
    out = {
        "workload": f"Art_{h}x{w}_sad{sad_radius}_range{search_range}",
        "interior_pixels": int(interior.sum()),
        "interior_exact_pct": round(
            float((~bad).mean(where=interior) * 100), 4
        ),
        "interior_mismatches": int(bad.sum()),
        "explained_by_init_threshold_quirk": int(quirk.sum()),
        "unexplained": int((bad & ~quirk).sum()),
        "all_pixels_exact_pct": round(float((ref == ours).mean() * 100), 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    run_parity()

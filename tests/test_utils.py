"""utils: stage timers, artifact cache, jit-cache toggle."""

import time

import numpy as np

import jax.numpy as jnp

from gpu_stereo_matching_tpu.utils.cache import ArtifactCache, content_key
from gpu_stereo_matching_tpu.utils.profiling import FrameMetrics, StageTimer


def test_stage_timer_spans():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    x = jnp.ones((8, 8)) * 2
    with t.stage("b", fence=x):
        y = x + 1
    t.record("c", 0.5)
    d = t.as_dict()
    assert d["a"] >= 0.01 and "b" in d and d["c"] == 0.5
    assert t.total_seconds >= 0.51
    assert "a=" in t.summary()
    del y


def test_frame_metrics_json():
    m = FrameMetrics(
        pipeline="bm", height=10, width=20, num_disparities=8,
        stage_ms={"sad": 1.5}, fps=60.0, bad2=0.1,
    )
    s = m.to_json()
    assert '"pipeline": "bm"' in s and '"fps": 60.0' in s


def test_content_key_sensitivity(rng):
    a = rng.integers(0, 256, (4, 5), dtype=np.uint8)
    k1 = content_key("x", a, (4, 5))
    k2 = content_key("x", a, (4, 5))
    assert k1 == k2
    b = a.copy()
    b[0, 0] ^= 1
    assert content_key("x", b, (4, 5)) != k1
    assert content_key("y", a, (4, 5)) != k1


def test_artifact_cache_roundtrip(tmp_path):
    cache = ArtifactCache(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return {"v": np.arange(3)}

    v1 = cache.get_or_compute("k", compute)
    v2 = cache.get_or_compute("k", compute)
    assert len(calls) == 1
    np.testing.assert_array_equal(v1["v"], v2["v"])
    # fresh instance hits the disk tier
    cache2 = ArtifactCache(str(tmp_path))
    v3 = cache2.get_or_compute("k", compute)
    assert len(calls) == 1
    np.testing.assert_array_equal(v3["v"], np.arange(3))

"""Test configuration: force an 8-device CPU platform before JAX loads.

Multi-chip sharding paths are exercised on a virtual CPU mesh (the
reference had no analog — its tests were single-GPU visual A/B, SURVEY §4);
all kernels/tests must be platform-agnostic.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU: the ambient environment points JAX_PLATFORMS at a tunneled TPU
# platform ("axon"), and the container's sitecustomize imports jax before
# this file runs — so the env var alone is too late. Set both the env var
# and the config (the config update works until a backend is initialized).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


REFERENCE_ROOT = "/root/reference"


@pytest.fixture
def reference_images_root():
    root = os.path.join(REFERENCE_ROOT, "Images")
    if not os.path.isdir(root):
        pytest.skip("reference image assets not available")
    return root

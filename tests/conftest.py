"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the axon TPU plugin ignores JAX_PLATFORMS; the legacy var is honored
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# persistent compilation cache — the build host has a single CPU core, so
# caching compiled executables across test runs is a huge win
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin reads JAX_PLATFORMS from the *spawn* environment (a
# startup hook caches it before conftest runs), so the env assignments above
# are ignored when the outer shell exports JAX_PLATFORMS=axon: the TPU would
# become the default platform and jax.devices()/device_count() (create_mesh,
# the train CLI) would target the single tunneled chip instead of the
# 8-device CPU mesh.  The config update below works at runtime as long as no
# backend has initialized yet — measured: device_count goes 1 (TPU) -> 8.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture
def rng():
    return np.random.default_rng(42)

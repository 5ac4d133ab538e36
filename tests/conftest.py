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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices time-slice on this host's single core, so their threads
# can arrive at a collective rendezvous minutes apart under heavy per-step
# compute; XLA's watchdog then SIGABRTs the whole process (rendezvous.cc
# "terminate timeout").  The stall is benign oversubscription, not a hang —
# widen both timeouts far past the worst observed skew.
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags

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

"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4) so SPMD
paths are exercised without a pod, and keep TPU compile caches out of tests."""

import os

# Must be set before jax import.  Force-override: the session environment
# pins JAX_PLATFORMS=axon (the remote TPU tunnel), which would make every
# test a remote compile — and f64 linalg is CPU-only anyway.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers its TPU-tunnel backend and force-sets
# jax_platforms="axon,cpu" AFTER env vars are read — override it back.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache for the e2e tests.  MUST be (a) separate from the
# TPU bench cache — the axon remote-compile helper stores XLA:CPU AOT
# artifacts built for ITS machine — and (b) keyed by THIS machine's CPU
# features: sessions migrate between hosts, and deserializing an AOT CPU
# executable compiled for different CPU features segfaults inside
# compilation_cache.get_executable_and_time.
import hashlib

def _cpu_fingerprint():
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"

if os.environ.get("BUNDLER_TEST_NO_CACHE"):
    # Debug escape hatch: skip the persistent cache entirely.
    pass
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))),
                          f".jax_cache_cpu_{_cpu_fingerprint()}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _clear_jit_cache_after_slow(request):
    """Each e2e pipeline test compiles ~1-2 GB of executables; without
    clearing, a full-suite run balloons past 15 GB and gets OOM-killed."""
    yield
    if request.node.get_closest_marker("slow") is not None:
        jax.clear_caches()


@pytest.fixture(autouse=True, scope="module")
def _clear_jit_cache_per_module():
    """XLA:CPU segfaults (deterministically, inside compile/deserialize of a
    later executable) once a single process accumulates the whole suite's
    executables — reproduced with and without the persistent cache.  Bound
    the accumulation by dropping jit caches between test modules; the disk
    cache keeps cross-module recompiles cheap."""
    yield
    jax.clear_caches()

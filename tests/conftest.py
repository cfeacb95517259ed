"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (the driver
dry-runs the real multi-chip path separately via __graft_entry__).

Note: this image's sitecustomize pre-imports jax and registers the axon TPU
plugin before conftest runs, so setting JAX_PLATFORMS in os.environ here is
too late — jax.config.update is the only reliable override.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long sharded/mesh tests (>15 s each) — excluded from the "
        "default run; enable with FLUTPU_FULL_TESTS=1 or -m slow")


def pytest_collection_modifyitems(config, items):
    """Round-5 verdict #5: the suite tripled to 23+ min, almost all of it
    in a handful of 18-41 s sharded FVC/adaptive-grow/multihost tests.
    Default `pytest -q` skips @slow (keeping the run under ~10 min and
    the cpu_busy hold bounded); the FULL suite still runs via
    FLUTPU_FULL_TESTS=1 (CI/nightly and before driver captures)."""
    if os.environ.get("FLUTPU_FULL_TESTS"):
        return
    if config.getoption("-m"):
        return  # explicit marker selection wins
    skip = pytest.mark.skip(
        reason="slow suite: set FLUTPU_FULL_TESTS=1 (or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session", autouse=True)
def _cpu_busy_flag():
    """Hold the CLAUDE.md CPU-busy flag for the whole session so TPU
    wall-clock measurements' cpu_gate sees pytest without every caller
    having to remember the convention."""
    from flutpu.benchlock import hold_cpu_busy
    with hold_cpu_busy():
        yield


# Persistent XLA compile cache (round 5): on this 1-core host the suite
# is compile-dominated; cached recompiles cut repeat runs drastically.
# Keyed on HLO hash, so stale-cache correctness is jax's contract.
_cache = os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/flutpu-jax-test-cache")
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; the reference's analogue is
running MPI with ``mpiexec -n N`` on one host (/root/reference/src/makefile:18).
Our analogue is XLA's forced host-platform device count — the same sharded
code paths compile and execute over 8 virtual CPU devices.

x64 is enabled so CPU parity tests can match PETSc f64 residual histories.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin pins jax_platforms to "axon,cpu"; tests must run on the
# virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound (~180 jitted
# programs); caching XLA executables across runs makes re-runs fast.
#
# CAVEAT (r3): full-suite runs have segfaulted sporadically inside the
# cache WRITE (compilation_cache.put_executable_and_time) — three runs, at
# different tests, with and without concurrent processes — and cache LOADS
# print AOT machine-feature-mismatch warnings ("could lead to execution
# errors such as SIGILL") on this image.  Policy: the cache is ON for the
# quick tier (where the warm-run speedup matters for iteration, and runs
# are short enough that the write bug has never bitten) and OFF for full
# runs by default.  Override with SPIKE_TESTS_CACHE=1 (always on) / =0
# (always off).
_cache_env = os.environ.get("SPIKE_TESTS_CACHE", "")


def _enable_cache():
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


if _cache_env == "1":
    _enable_cache()

# ---------------------------------------------------------------------------
# Test tiers: the full suite is compile-heavy (~10 min).  Modules dominated
# by multi-device shard_map compiles are marked "slow" so the iteration tier
# (`pytest -m "not slow"` / `make test-quick`) stays fast.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SLOW_MODULES = {
    "test_parallel", "test_fieldsplit", "test_dist_auction",
    "test_matching_dev", "test_baseline_configs", "test_pallas_sweeps",
    "test_autodiff", "test_elastic", "test_dist_parity",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy tests (multi-device shard_map, "
        "large configs); excluded by `make test-quick`")
    # quick tier (-m "not slow"): enable the persistent cache unless the
    # env var pinned a choice (see the cache caveat above)
    if _cache_env == "" and "slow" in (config.option.markexpr or ""):
        _enable_cache()


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)

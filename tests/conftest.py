"""Test configuration: force an 8-device virtual CPU platform so data/tensor/
expert-parallel code paths are exercised without TPU hardware (the rebuild's
replacement for the reference's untested multi-node story — SURVEY.md §4).

Note: the environment may pre-import jax with a TPU platform pinned via env
vars, so we override through jax.config (which wins as long as no backend has
been initialized yet) rather than os.environ.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent executable cache for the suite: the CI box has ONE core, and
# most of a test run is XLA recompiling the same tiny programs — re-runs
# (the commit-gate workflow) hit the cache instead. JAX_TEST_CACHE=""
# disables (e.g. to measure cold-compile time itself).
_cache = os.environ.get("JAX_TEST_CACHE", "/tmp/jax_test_cache")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="run the slow tier too (trainer-integration matrix, "
             "interpreted-Pallas kernel depth); the default tier is the "
             "fast CI gate — see README 'Test tiers'",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: depth tier, skipped unless --slow (full suite) is passed",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --slow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True)
def _reset_ambient_mesh():
    """Trainers set the ambient mesh globally for their lifetime
    (jax.sharding.set_mesh in BaseTrainer); without a reset it leaks into
    later tests, whose models then dispatch to sharded paths on a stale
    mesh (or fail placement when device sets differ)."""
    yield
    try:
        from jax._src import mesh as mesh_lib

        jax.sharding.set_mesh(mesh_lib.empty_concrete_mesh)
    except Exception as e:  # private API — make a JAX-upgrade break VISIBLE
        import warnings

        warnings.warn(
            f"ambient-mesh reset failed ({e!r}) — jax moved "
            "empty_concrete_mesh? Trainer tests may leak their mesh into "
            "later tests."
        )

"""Test env: force CPU with 8 virtual devices BEFORE jax initializes.

This is the TPU analog of the reference's missing "multi-node testing without
a cluster" (SURVEY.md §4): multi-chip sharding paths are validated on a
virtual 8-device CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The preinstalled 'axon' TPU plugin ignores JAX_PLATFORMS env alone; the
# config update is what actually pins the backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: model-level tests compile large graphs; cache
# makes re-runs fast.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (CLI chains)"
    )


def run_cli(path, argv):
    """Run a tools/ CLI in-process (argv-swapped runpy), as a user would."""
    import runpy
    import sys

    old = sys.argv
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old

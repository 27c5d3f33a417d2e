"""Test configuration: force CPU with an 8-device virtual mesh and x64.

Mirrors the reference's differential-test strategy (SURVEY.md §4): tests run
the identical math in float64 on CPU against NumPy/SciPy references; the
8-device host platform exercises the multi-chip sharding path without TPU
hardware (the driver separately dry-runs multi-chip compile).

Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA-CPU compiles are ~0.4s per op in this
# environment; the cache makes repeat test runs ~15x faster.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

"""Test configuration: force local CPU with an 8-device virtual mesh + x64.

Mirrors the reference's differential-test strategy (SURVEY.md §4): tests run
the identical math in float64 on CPU against NumPy/SciPy references; the
8-device virtual platform exercises the multi-chip sharding path without TPU
hardware (the driver separately dry-runs multi-chip compile).

This environment's sitecustomize imports jax at interpreter start and locks
the platform to the remote 'axon' TPU (whose XLA compiles go through a relay
at ~0.4 s/op). Setting JAX_PLATFORMS via env is therefore too late — the
config must be updated directly on the already-imported jax module, which
cleanly reroutes everything to fast local CPU devices.
"""

import os

# must precede first backend initialization
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still open)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache for fast repeat runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

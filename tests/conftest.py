"""Test env: run JAX on CPU with 8 virtual devices so multi-chip sharding
tests exercise a real Mesh without TPU hardware.

Note: the axon TPU plugin registers itself via sitecustomize at interpreter
startup, so JAX_PLATFORMS env vars set here are too late; forcing the
platform through jax.config before first backend use does work.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compile cache: XLA compilation dominates test wall-time; cache
# executables across pytest runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test env: run JAX on CPU with 8 virtual devices so multi-chip sharding
tests exercise a real Mesh without TPU hardware.

The axon TPU plugin registers itself via sitecustomize at interpreter
startup and snapshots jax_platforms='axon,cpu', so JAX_PLATFORMS set here
is too late; forcing the platform through jax.config before first backend
use does work.  (A re-exec into a plugin-free child process is NOT an
option inside a conftest: pytest's capture plugin has already replaced
fd1/fd2 with temp capture files when conftests import, so the exec'd
child's output vanishes and the suite runs silently.)
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA:CPU COMPILE-dominated (LLVM passes, not test compute):
# backend opt level 0 + no expensive LLVM passes cut the cold fast tier
# ~2.3x on the worst files with identical numerics (same HLO semantics,
# only less codegen optimization; measured round 5).
if "xla_backend_optimization_level" not in _flags:
    _flags += (" --xla_backend_optimization_level=0"
               " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = _flags
os.environ["JAX_PLATFORMS"] = "cpu"   # env ships JAX_PLATFORMS=axon

# Persistent compile cache: XLA compilation dominates test wall-time; cache
# executables across pytest runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

# Unconditional, and BEFORE any backend query: jax.default_backend() /
# jax.devices() would initialize the axon backend, after which this
# update is too late and the whole suite silently runs on the TPU chip
# (whose bf16-default matmuls fail every <=1e-4-tolerance numeric test).
jax.config.update("jax_platforms", "cpu")

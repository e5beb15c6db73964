"""Test harness: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware; the real
chip is exercised by bench.py and the driver's compile checks.
"""

import os

# XLA:CPU jit-compiles a few hundred executables across the suite; each
# holds many small mmaps and the kernel default vm.max_map_count = 65530
# gets exhausted mid-run (observed: LLVM "Cannot allocate memory" followed
# by a libgcc segfault in the slow suite).  Raise it when permitted (root
# containers/VMs); harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count", "w") as _f:
        _f.write("2000000")
except OSError:
    pass

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin (sitecustomize) overrides jax_platforms at import
# time; force it back so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite jits a few hundred programs (many
# of them large vmapped IPM solves); cold compiles dominate wall time.  With
# a warm cache the full suite drops from ~1 h to minutes.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices()

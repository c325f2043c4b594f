"""Test config: run JAX on a virtual 8-device CPU mesh.

The TPU-native answer to multi-chip testing without a cluster (SURVEY.md §4):
shardings are exercised on 8 virtual CPU devices via XLA flags. The harness
environment pins JAX_PLATFORMS=axon (the tunneled TPU); env vars alone do not
override it, so we force the platform through jax.config before any backend
initialization.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the platform the session was launched with, before this conftest forces
# cpu -- lets tests reproduce the driver environment in subprocesses
ORIG_JAX_PLATFORMS = os.environ.get("JAX_PLATFORMS")
ORIG_XLA_FLAGS = os.environ.get("XLA_FLAGS")

# import-light (no jax); the flag rationale lives in its module docstring
from midi_vae_tpu.xla_cpu_env import merged_xla_flags  # noqa: E402

os.environ["XLA_FLAGS"] = merged_xla_flags(
    os.environ.get("XLA_FLAGS"), n_devices=8
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NO persistent jit-compilation cache on the CPU backend. It was enabled
# here through round 3 (keyed by utils/profiling.host_cpu_fingerprint);
# round 4 retired it after two independent failure modes on these
# migrating VMs: (a) entries compiled on another host abort or DEADLOCK
# on load even with cpuinfo-identical hosts (LLVM features come from
# CPUID, which the VMM exposes differently), and (b) the XLA:CPU
# serialization path itself (a full AOT re-compile) intermittently
# deadlocks on WRITE -- all threads futex-wait at zero CPU and pytest
# hangs forever in device_get. Suite compiles are CPU-cheap; determinism
# is worth more. The TPU-side cache (enable_compilation_cache) is
# unaffected.


def tools_module(name: str):
    """Import a module from the repo-root tools/ directory (not a package)."""
    import importlib
    import sys

    tools_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools_dir)
    try:
        return importlib.import_module(name)
    finally:
        sys.path.remove(tools_dir)

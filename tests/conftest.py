"""Test config: run JAX on a virtual 8-device CPU mesh.

The TPU-native answer to multi-chip testing without a cluster (SURVEY.md §4):
shardings are exercised on 8 virtual CPU devices via XLA flags. The harness
environment pins JAX_PLATFORMS=axon (the tunneled TPU); env vars alone do not
override it, so we force the platform through jax.config before any backend
initialization.
"""
import os

# the platform the session was launched with, before this conftest forces
# cpu -- lets tests reproduce the driver environment in subprocesses
ORIG_JAX_PLATFORMS = os.environ.get("JAX_PLATFORMS")
ORIG_XLA_FLAGS = os.environ.get("XLA_FLAGS")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout_seconds" not in flags:
    # XLA:CPU in-process collectives CHECK-fail ("AwaitAndLogIfStuck" ->
    # SIGABRT) when the 8-way rendezvous takes longer than the default
    # timeout. On a 1-core VM the 8 virtual partitions of a chunked-epoch
    # program execute SERIALLY, so the first participant legitimately
    # waits 7x a partition's pre-collective work before the others
    # arrive -- seconds-to-minutes for the big epoch programs. Raise the
    # terminate timeout; a real deadlock still aborts, just later.
    flags = flags + " --xla_cpu_collective_timeout_seconds=1200 --xla_cpu_collective_call_warn_stuck_timeout_seconds=600 --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = flags
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

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
    flags = flags + " --xla_cpu_collective_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent jit-compilation cache: repeat test runs skip recompiles. The
# dir is keyed by the host CPU fingerprint: XLA:CPU cache entries from a
# different host ABORT the process when loaded (utils/profiling.py
# host_cpu_fingerprint), observed as suite-killing "Fatal Python error:
# Aborted" when the VM migrated hosts.
from midi_vae_tpu.utils.profiling import host_cpu_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/midi_vae_tpu_jax_cache_{host_cpu_fingerprint()}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


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

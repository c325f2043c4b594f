"""XLA:CPU environment flags for virtual-mesh testing -- single source.

The TPU-native answer to multi-chip testing without a cluster (SURVEY.md
§4) is a virtual N-device CPU mesh via ``--xla_force_host_platform_device_
count``. On few-core VMs the N virtual partitions of a compiled program
execute SERIALLY, so the first participant of an in-program collective
legitimately waits (N-1)x a partition's pre-collective work before the
others arrive -- seconds to minutes for reference-scale epoch programs --
and XLA:CPU's default rendezvous timeout then CHECK-aborts the process
("AwaitAndLogIfStuck" -> SIGABRT). These flags raise the warn/terminate
timeouts; a real deadlock still aborts, just later.

Used by tests/conftest.py, __graft_entry__ (dry-run bootstrap + both
multiprocess worker templates), and tests/test_distributed.py. Each flag
is guarded INDIVIDUALLY against the pre-existing flag string, so an
environment that pre-sets only some of them gets no duplicates.

This module must stay import-light (no jax/numpy): callers set the
environment BEFORE any backend initialization.
"""

from __future__ import annotations

CPU_COLLECTIVE_FLAGS: dict[str, int] = {
    "xla_cpu_collective_timeout_seconds": 1200,
    "xla_cpu_collective_call_warn_stuck_timeout_seconds": 600,
    "xla_cpu_collective_call_terminate_timeout_seconds": 1200,
}


def merged_xla_flags(
    existing: str | None = None, n_devices: int | None = None
) -> str:
    """Merge the CPU-mesh flags into an existing XLA_FLAGS string.

    ``n_devices``: also request that many virtual CPU devices (skipped when
    the existing string already pins a device count)."""
    flags = existing or ""
    if n_devices is not None and (
        "xla_force_host_platform_device_count" not in flags
    ):
        flags = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    for name, value in CPU_COLLECTIVE_FLAGS.items():
        if name not in flags:
            flags = (flags + f" --{name}={value}").strip()
    return flags

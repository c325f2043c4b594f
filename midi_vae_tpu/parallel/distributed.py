"""Multi-process (multi-host) training support.

The reference is single-process (SURVEY.md §2.3); this module is the
framework's multi-host layer: ``jax.distributed`` initialization, a global
('data','model') mesh spanning every process's devices, and global-batch
assembly from per-process local shards
(``jax.make_array_from_process_local_data``). XLA GSPMD emits the cross-host
collectives (ICI within a slice, DCN across slices).

Tested with multiple CPU processes on one machine (tests/test_distributed.py)
-- the same code path a v5e pod slice uses.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
) -> None:
    """Join the distributed runtime. Call before any jax device use."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_distributed() -> bool:
    return jax.process_count() > 1


def global_mesh(n_model: int = 1) -> Mesh:
    """('data','model') mesh over ALL processes' devices."""
    devices = jax.devices()  # global across processes
    n = len(devices)
    if n % n_model != 0:
        raise ValueError(f"{n} global devices not divisible by model={n_model}")
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def process_slice(n_items: int) -> slice:
    """The contiguous range of a length-n dataset owned by this process.

    ``global_batch_from_local`` requires EQUAL per-process row counts
    (jax.make_array_from_process_local_data infers the global shape from
    uniform local shapes), so n_items must divide by the process count --
    pad first (parallel.mesh.pad_batch_to) when it doesn't.
    """
    k = jax.process_count()
    i = jax.process_index()
    if n_items % k != 0:
        raise ValueError(
            f"{n_items} rows not divisible by {k} processes; pad the batch "
            "first (global_batch_from_local needs equal per-process shards)"
        )
    per = n_items // k
    return slice(i * per, (i + 1) * per)


def global_batch_from_local(batch: dict, mesh: Mesh) -> dict:
    """Assemble a globally-sharded batch from per-process local rows.

    Every process passes its local shard (same per-process row count); the
    result is one logical array sharded over the 'data' mesh axis.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }

"""Background checkpoint/metadata writer.

The reference blocks training for every ``save_weights`` call
(/root/reference/vae_training.py:966-978). Here saves run off the critical
path: the trainer dispatches a jitted on-device state *clone* (so the live
params can keep training -- donation-safe) and hands the clone to this
writer, whose single worker thread materializes the arrays (blocking in the
thread, not the train loop) and writes the orbax checkpoint + history.json.

One worker, FIFO: saves never interleave, and ``wait()`` gives a barrier
that re-raises the first failure (a training run must not silently lose its
checkpoints).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable


class AsyncCheckpointWriter:
    """Runs submitted thunks on one background thread, FIFO."""

    def __init__(self) -> None:
        self._queue: queue.Queue = queue.Queue()
        self._error: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, name="ckpt-writer", daemon=True
        )
        self._thread.start()

    def _run(self) -> None:
        while True:
            job = self._queue.get()
            if job is None:
                self._queue.task_done()
                return
            try:
                if self._error is None:  # fail fast: skip work after an error
                    job()
            except BaseException as err:  # noqa: BLE001 -- re-raised in wait()
                self._error = err
            finally:
                self._queue.task_done()

    def submit(self, job: Callable[[], None]) -> None:
        """Enqueue a save thunk; raises a prior job's failure eagerly."""
        self._check()
        self._queue.put(job)

    def wait(self) -> None:
        """Block until every submitted job finished; re-raise any failure."""
        self._queue.join()
        self._check()

    def close(self) -> None:
        """Drain the queue, stop the worker, re-raise any failure."""
        self._queue.join()
        self._queue.put(None)
        self._queue.join()
        self._thread.join(timeout=60)
        self._check()

    def _check(self) -> None:
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err

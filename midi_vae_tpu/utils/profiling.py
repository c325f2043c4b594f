"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md §5: only progressbar wall
progress). The framework provides:

* ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of everything inside,
* ``StepTimer``: lightweight wall-clock step timing with warmup discard and
  percentile summaries -- the numbers bench.py reports.
"""

from __future__ import annotations

import contextlib
import math
import os
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    warmup: int = 3
    _times: list[float] = field(default_factory=list)
    _seen: int = 0
    _t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)
        return False

    @property
    def count(self) -> int:
        return len(self._times)

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        ts = sorted(self._times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            # nearest-rank p90: ceil(0.9n)-th order statistic (int(n*0.9)
            # selects one rank too high whenever 0.9n is integral -- the
            # MAX for any n <= 10)
            "p90_s": ts[max(0, math.ceil(n * 0.9) - 1)],
            "min_s": ts[0],
            "max_s": ts[-1],
        }

    def throughput(self, items_per_step: float) -> float:
        s = self.summary()
        if not s.get("steps"):
            return 0.0
        return items_per_step / s["mean_s"]


def host_cpu_fingerprint() -> str:
    """Short hash of the host CPU's identity. XLA:CPU executables are
    AOT-compiled against the compiling host's exact LLVM feature set and
    ABORT (SIGILL-class) when a persistent-cache entry from a different
    host is loaded ("Target machine feature +prefer-no-scatter is not
    supported on the host machine" -- observed when these VMs migrate
    hosts). Cache directories are keyed by this fingerprint so a host
    change means a recompile, never a crash.

    The /proc/cpuinfo *flags* line alone is NOT enough: LLVM tuning
    features like +prefer-no-gather depend on the CPU model/stepping/
    microcode (Downfall-class mitigations), so two hosts can share
    identical flags yet produce ABI-incompatible AOT blobs -- observed
    as a migration-surviving /tmp cache aborting the test suite. Hash
    the model identity lines and the jaxlib version too."""
    import hashlib

    parts = []
    try:
        keys = ("flags", "model name", "model", "cpu family", "stepping",
                "microcode", "vendor_id")
        seen = {}
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in keys and key not in seen:
                    val = line.split(":", 1)[1].strip()
                    if key == "flags":
                        val = " ".join(sorted(val.split()))
                    seen[key] = val
        parts = [f"{k}={seen[k]}" for k in keys if k in seen]
    except OSError:
        import platform

        parts = [platform.processor() or platform.machine()]
    try:
        import jaxlib

        parts.append(f"jaxlib={jaxlib.__version__}")
    except Exception:  # pragma: no cover - jaxlib is always present
        pass
    return hashlib.sha1(";".join(parts).encode()).hexdigest()[:10]


def enable_compilation_cache() -> None:
    """Persistent jit cache: big-program compiles happen once per machine.

    Every CLI calls this before touching jax (the tunneled dev TPU takes
    minutes to compile the wide programs; the second run of any CLI is
    fast). Override the location with MIDI_VAE_TPU_JAX_CACHE. The
    directory is keyed by the host CPU fingerprint (see
    host_cpu_fingerprint) so stale cross-host XLA:CPU executables can
    never be loaded.
    """
    import jax

    cache = os.environ.get(
        "MIDI_VAE_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "midi_vae_tpu", "jax"),
    )
    cache = os.path.join(cache, host_cpu_fingerprint())
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

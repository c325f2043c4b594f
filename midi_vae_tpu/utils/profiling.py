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


def _x86_cpuid_blob() -> bytes:
    """Raw CPUID output for the leaves LLVM's host detection reads.

    LLVM's ``getHostCPUName``/``getHostCPUFeatures`` (what XLA:CPU
    AOT-compiles against) is a pure function of the CPUID instruction --
    NOT of /proc/cpuinfo, which a VMM can mask or synthesize identically
    across hosts whose CPUID differs (observed on these firecracker VMs:
    identical cpuinfo flags/model/stepping/microcode, different LLVM
    tuning features like +prefer-no-gather). Execute CPUID directly via a
    tiny machine-code stub in an anonymous executable mapping and hash the
    leaves; returns b"" on any failure (non-x86, W^X mmap denied).
    """
    import ctypes
    import mmap
    import platform
    import struct

    if platform.machine() != "x86_64":
        return b""
    try:
        # cpuid_stub(uint32 leaf, uint32 subleaf, uint32 out[4])
        #   mov eax, edi ; mov ecx, esi ; push rbx ; cpuid
        #   mov [rdx], eax ; mov [rdx+4], ebx ; mov [rdx+8], ecx
        #   mov [rdx+12], edx_saved ... (edx is the out ptr -- stash in r8)
        code = bytes([
            0x49, 0x89, 0xD0,        # mov r8, rdx   (out ptr)
            0x89, 0xF8,              # mov eax, edi  (leaf)
            0x89, 0xF1,              # mov ecx, esi  (subleaf)
            0x53,                    # push rbx
            0x0F, 0xA2,              # cpuid
            0x41, 0x89, 0x00,        # mov [r8], eax
            0x41, 0x89, 0x58, 0x04,  # mov [r8+4], ebx
            0x41, 0x89, 0x48, 0x08,  # mov [r8+8], ecx
            0x41, 0x89, 0x50, 0x0C,  # mov [r8+12], edx
            0x5B,                    # pop rbx
            0xC3,                    # ret
        ])
        buf = mmap.mmap(-1, len(code), prot=mmap.PROT_READ | mmap.PROT_WRITE | mmap.PROT_EXEC)
        buf.write(code)
        addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
        fn = ctypes.CFUNCTYPE(
            None, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32 * 4),
        )(addr)
        out = (ctypes.c_uint32 * 4)()
        blob = b""
        # the leaves LLVM's X86 host detection consumes: basic identity,
        # feature leaves 1/7(.0/.1/.2)/D(.0/.1)/14/19/1C/24, and the
        # extended-feature leaves. Per-CORE-variant leaves are excluded:
        # leaf 0x1A (hybrid core type -- differs between P and E cores, so
        # hashing it makes the fingerprint depend on which core runs the
        # stub) is dropped, and leaf 1's EBX is zeroed before hashing (its
        # bits 31:24 are the initial APIC ID of the EXECUTING logical CPU,
        # bits 23:16 the topology-dependent logical-processor count) --
        # otherwise the fingerprint flaps run-to-run on any multi-vCPU
        # host and the persistent compile cache it keys silently always
        # misses.
        leaves = [(0x0, 0), (0x1, 0), (0x6, 0), (0x7, 0), (0x7, 1), (0x7, 2),
                  (0xD, 0), (0xD, 1), (0x14, 0), (0x19, 0),
                  (0x1C, 0), (0x24, 0),
                  (0x80000000, 0), (0x80000001, 0), (0x80000008, 0)]
        for leaf, sub in leaves:
            fn(leaf, sub, ctypes.byref(out))
            words = list(out)
            if (leaf, sub) == (0x1, 0):
                words[1] = 0  # EBX: APIC id / logical CPU count, per-core
            blob += struct.pack("<4I", *words)
        del fn
        return blob
    except Exception:
        return b""


def host_cpu_fingerprint() -> str:
    """Short hash of the host CPU's identity. XLA:CPU executables are
    AOT-compiled against the compiling host's exact LLVM feature set and
    CRASH OR DEADLOCK when a persistent-cache entry from a different
    host is loaded ("Target machine feature +prefer-no-scatter is not
    supported on the host machine" -- observed when these VMs migrate
    hosts). Cache directories are keyed by this fingerprint so a host
    change means a recompile, never a crash.

    The /proc/cpuinfo *flags* line alone is NOT enough: LLVM tuning
    features like +prefer-no-gather depend on the CPU model/stepping/
    microcode (Downfall-class mitigations), so two hosts can share
    identical flags yet produce ABI-incompatible AOT blobs -- observed
    as a migration-surviving /tmp cache aborting the test suite. Round 4
    found even model+stepping+microcode insufficient (the VMM masks
    cpuinfo; two hosts with byte-identical cpuinfo produced different
    LLVM feature sets, and the stale entries DEADLOCKED the 8-partition
    collective programs instead of aborting), so the key's primary
    ingredient is now the raw CPUID leaves LLVM actually reads
    (_x86_cpuid_blob); the cpuinfo lines remain as fallback signal."""
    import hashlib

    parts = []
    blob = _x86_cpuid_blob()
    if blob:
        parts.append(f"cpuid={hashlib.sha1(blob).hexdigest()}")
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
        parts.extend(f"{k}={seen[k]}" for k in keys if k in seen)
    except OSError:
        import platform

        parts.append(platform.processor() or platform.machine())
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

    CPU backends get NO persistent cache: XLA:CPU executable
    serialization runs the whole AOT pipeline and was observed (2026-08,
    this environment) to intermittently DEADLOCK on write (all threads
    futex-wait, zero CPU) and to abort or deadlock when loading entries
    compiled on another host -- and CPU-backend runs here are tests and
    dryruns whose compiles are cheap. TPU executables serialize through
    a different (safe) path and are the expensive compiles this cache
    exists for.
    """
    import jax

    if jax.default_backend() == "cpu":
        return

    cache = os.environ.get(
        "MIDI_VAE_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "midi_vae_tpu", "jax"),
    )
    cache = os.path.join(cache, host_cpu_fingerprint())
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

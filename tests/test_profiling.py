"""Host-fingerprint guard for the persistent compilation cache.

The cache dir is keyed by ``host_cpu_fingerprint()``; a key that fails to
distinguish two hosts lets XLA:CPU load AOT blobs compiled elsewhere, which
aborts or (worse) silently deadlocks the 8-partition collective programs.
/proc/cpuinfo proved insufficient (the VMM masks it identically across
hosts whose CPUID differs), so the fingerprint executes CPUID directly --
the same source LLVM's host feature detection reads.
"""
import platform

from midi_vae_tpu.utils.profiling import _x86_cpuid_blob, host_cpu_fingerprint


class TestHostFingerprint:
    def test_stable_across_calls(self):
        assert host_cpu_fingerprint() == host_cpu_fingerprint()
        assert len(host_cpu_fingerprint()) == 10

    def test_cpuid_blob_present_on_x86(self):
        blob = _x86_cpuid_blob()
        if platform.machine() != "x86_64":
            assert blob == b""
            return
        # 15 leaves x 4 dwords (leaf 0x1A excluded: per-core-variant on
        # hybrid parts); deterministic (same process, same CPU)
        assert len(blob) == 240
        assert blob == _x86_cpuid_blob()
        # leaf 0 ebx/ecx/edx carry the vendor string -- non-zero on real HW
        assert any(blob[4:16])
        # leaf 1 EBX (blob[16+4:16+8]) is zeroed: bits 31:24 are the initial
        # APIC ID of the EXECUTING core, which would flap the fingerprint
        # (and thus the persistent-cache key) across cores on multi-vCPU
        # hosts
        assert blob[20:24] == b"\x00\x00\x00\x00"

    def test_cpuid_feeds_fingerprint(self):
        """The fingerprint must CHANGE when CPUID output changes -- the
        round-4 regression was exactly this ingredient being dropped."""
        import midi_vae_tpu.utils.profiling as prof

        if platform.machine() != "x86_64":
            return
        base = host_cpu_fingerprint()
        orig = prof._x86_cpuid_blob
        prof._x86_cpuid_blob = lambda: b"different-cpu"
        try:
            assert host_cpu_fingerprint() != base
        finally:
            prof._x86_cpuid_blob = orig

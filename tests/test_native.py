"""Native C++ SMF parser: parity with the pure-Python parser + speed sanity."""

import numpy as np
import pytest

from midi_vae_tpu.data import smf
from midi_vae_tpu.native import get_smf_lib


def make_song(path, n_notes=64, seed=0, bpm=110.0):
    rng = np.random.RandomState(seed)
    mid = smf.MidiFile(initial_tempo=bpm)
    for prog in (0, 33):
        inst = smf.Instrument(program=prog)
        t = 0.0
        for _ in range(n_notes):
            pitch = int(rng.randint(36, 90))
            dur = 0.1 * rng.randint(1, 5)
            inst.notes.append(smf.Note(pitch, int(rng.randint(30, 120)), t, t + dur))
            t += dur * rng.choice([0.5, 1.0])
        mid.instruments.append(inst)
    mid.write(str(path))
    return mid


@pytest.mark.skipif(get_smf_lib() is None, reason="native lib unavailable")
class TestNativeParser:
    def test_parity_with_python_parser(self, tmp_path):
        path = tmp_path / "song.mid"
        make_song(path)
        py = smf.read_midi(str(path), native=False)
        nat = smf.read_midi(str(path), native=True)
        assert len(py.instruments) == len(nat.instruments)
        t_py, b_py = py.get_tempo_changes()
        t_nat, b_nat = nat.get_tempo_changes()
        np.testing.assert_allclose(t_py, t_nat)
        np.testing.assert_allclose(b_py, b_nat)
        for ip, in_ in zip(py.instruments, nat.instruments):
            assert ip.program == in_.program
            assert len(ip.notes) == len(in_.notes)
            for a, b in zip(ip.notes, in_.notes):
                assert a.pitch == b.pitch and a.velocity == b.velocity
                assert abs(a.start - b.start) < 1e-9
                assert abs(a.end - b.end) < 1e-9

    def test_parity_through_tensorizer(self, tmp_path):
        from midi_vae_tpu.config import Config
        from midi_vae_tpu.data import tensorize

        cfg = Config()
        path = tmp_path / "song2.mid"
        make_song(path, seed=3)
        s_py = tensorize.load_rolls(smf.read_midi(str(path), native=False), cfg)
        s_nat = tensorize.load_rolls(smf.read_midi(str(path), native=True), cfg)
        np.testing.assert_array_equal(s_py.Y, s_nat.Y)
        np.testing.assert_array_equal(s_py.V, s_nat.V)
        np.testing.assert_array_equal(s_py.D, s_nat.D)
        np.testing.assert_array_equal(s_py.I, s_nat.I)

    def test_garbage_raises(self):
        from midi_vae_tpu.native import parse_smf_native

        with pytest.raises(ValueError):
            parse_smf_native(b"definitely not midi data")

    def test_meta_overrun_skipped_identically(self, tmp_path):
        """A tempo meta whose declared length over-runs the chunk must be
        skipped by BOTH parsers (native payload_ok semantics), not read
        truncated by one and skipped by the other."""
        import struct

        body = bytes([0x00, 0xFF, 0x51, 0x05, 0x0A, 0x12, 0x0B])
        data = (
            b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480)
            + b"MTrk" + struct.pack(">I", len(body)) + body
        )
        p = tmp_path / "overrun.mid"
        p.write_bytes(data)
        nat = smf.read_midi(str(p), native=True)
        py = smf.read_midi(str(p), native=False)
        assert nat.get_tempo_changes() == py.get_tempo_changes()
        # both must fall back to the 120 BPM default, not read 3 of 5 bytes
        assert py.get_tempo_changes()[1][0] == pytest.approx(120.0)

    def test_corruption_differential(self, tmp_path):
        """Byte-level corruption (truncation, random flips, garbage
        headers) must produce IDENTICAL outcomes from the native and
        Python parsers -- same notes/tempi bit-exactly, or the same
        exception class -- so tensorization never depends on which parser
        is available. Exercises: trailing-delta hanging-note close,
        chunk-bounded varlen reads, MidiParseError from the native
        wrapper, ulp-identical tick->seconds conversion."""
        rng = np.random.RandomState(5)
        path = tmp_path / "song3.mid"
        make_song(path, seed=5)
        clean = bytearray(open(path, "rb").read())
        outcomes = {"ok": 0, "err": 0}
        for k in range(90):
            data = bytearray(clean)
            mode = k % 3
            if mode == 0:
                data = data[: rng.randint(1, len(data))]
            elif mode == 1:
                for _ in range(rng.randint(1, 8)):
                    data[rng.randint(0, len(data))] = rng.randint(0, 256)
            else:
                data[:4] = bytes(rng.randint(0, 256, 4).tolist())
            p = tmp_path / "corrupt.mid"
            open(p, "wb").write(bytes(data))

            def attempt(native):
                try:
                    m = smf.read_midi(str(p), native=native)
                    return ("ok", tuple(
                        (i.program, i.is_drum, tuple(
                            (n.pitch, n.start, n.end, n.velocity)
                            for n in i.notes))
                        for i in m.instruments
                    ), tuple(map(tuple, zip(*m.get_tempo_changes()))))
                except Exception as e:  # noqa: BLE001 -- class compared
                    return ("err", type(e).__name__)

            a, b = attempt(True), attempt(False)
            assert a == b, f"case {k}: native {a[:2]} vs python {b[:2]}"
            outcomes[a[0]] += 1
        # the battery must actually exercise both outcomes
        assert outcomes["ok"] and outcomes["err"], outcomes

    def test_native_faster(self, tmp_path):
        import time

        path = tmp_path / "big.mid"
        make_song(path, n_notes=2000, seed=7)
        data = open(path, "rb").read()

        def best_of(fn, repeats=5, rounds=3):
            # best-of-rounds makes the comparison robust to transient host
            # load (scheduler noise only ever adds time)
            best = float("inf")
            for _ in range(rounds):
                t0 = time.perf_counter()
                for _ in range(repeats):
                    fn(data)
                best = min(best, time.perf_counter() - t0)
            return best

        py_time = best_of(smf.parse_midi_bytes)
        nat_time = best_of(smf._parse_midi_bytes_native)
        # the C++ walk should comfortably beat the Python byte loop
        assert nat_time < py_time

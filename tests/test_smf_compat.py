"""SMF compatibility battery: SMPTE division, format 0/1/2 semantics,
and torture cases (cross-track tempo metas, non-4/4 signatures,
zero-length tracks).

The reference imports whatever pretty_midi parses (import_midi.py:17-22 is
its only failure story); this framework's own SMF layer must therefore
accept the same division/format space. Decided semantics (PARITY.md "SMF
format and division semantics"):

* SMPTE division: ticks advance on the fixed fps x ticks-per-frame wall
  clock (SMF spec); tempo metas do not affect timing but are surfaced as
  the advisory BPM map the tensorizer quantizes against (default 120).
* Formats 0/1/2 all parse; tempo/time-signature events are honored from
  the FIRST track only (pretty_midi's _load_tempo_changes/_load_metadata
  read tracks[0] and warn-and-ignore the rest).

Every case asserts the Python and native (C++) parsers agree bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from midi_vae_tpu.data import smf


# ---------------------------------------------------------------------------
# raw-bytes builders (the writer only emits PPQ format 1; these tests need
# full control of the MThd division/format words)
# ---------------------------------------------------------------------------

def _vlq(value: int) -> bytes:
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    return bytes(reversed(out))


def _track(events: list[tuple[int, bytes]]) -> bytes:
    """events: (absolute_tick, raw bytes) -> MTrk chunk."""
    body = bytearray()
    prev = 0
    for tick, raw in sorted(events, key=lambda e: e[0]):
        body += _vlq(tick - prev) + raw
        prev = tick
    body += _vlq(0) + bytes([0xFF, 0x2F, 0x00])
    return b"MTrk" + struct.pack(">I", len(body)) + bytes(body)


def _smf_bytes(fmt: int, division: int, tracks: list[bytes]) -> bytes:
    return (
        b"MThd" + struct.pack(">IHHH", 6, fmt, len(tracks), division)
        + b"".join(tracks)
    )


def _tempo(uspq: int) -> bytes:
    return bytes([0xFF, 0x51, 0x03]) + uspq.to_bytes(3, "big")


def _timesig(num: int, den_pow: int) -> bytes:
    return bytes([0xFF, 0x58, 0x04, num, den_pow, 24, 8])


def _on(ch: int, pitch: int, vel: int = 80) -> bytes:
    return bytes([0x90 | ch, pitch, vel])


def _off(ch: int, pitch: int) -> bytes:
    return bytes([0x80 | ch, pitch, 0])


def _both_parsers(data: bytes) -> tuple[smf.MidiFile, smf.MidiFile]:
    py = smf.parse_midi_bytes(data)
    nat = smf._parse_midi_bytes_native(data)
    assert nat is not None, "native parser unavailable"
    return py, nat


def _assert_same(py: smf.MidiFile, nat: smf.MidiFile) -> None:
    assert py.format == nat.format
    assert py.smpte == nat.smpte
    assert py.resolution == nat.resolution
    assert py.get_tempo_changes() == nat.get_tempo_changes()
    assert [
        (t.numerator, t.denominator, t.time) for t in py.time_signature_changes
    ] == [
        (t.numerator, t.denominator, t.time) for t in nat.time_signature_changes
    ]
    assert len(py.instruments) == len(nat.instruments)
    for a, b in zip(py.instruments, nat.instruments):
        assert (a.program, a.is_drum) == (b.program, b.is_drum)
        an = [(n.pitch, n.velocity, n.start, n.end) for n in a.notes]
        bn = [(n.pitch, n.velocity, n.start, n.end) for n in b.notes]
        assert an == bn  # bit-for-bit float equality


SMPTE_24_8 = ((256 - 24) << 8) | 8      # fps 24, 8 ticks/frame
SMPTE_25_40 = ((256 - 25) << 8) | 40
SMPTE_2997_10 = ((256 - 29) << 8) | 10  # -29 => 29.97 drop-frame
SMPTE_30_80 = ((256 - 30) << 8) | 80


class TestSmpteDivision:
    def test_decode_division(self):
        assert smf.decode_division(480) is None
        assert smf.decode_division(SMPTE_24_8) == (24.0, 8)
        assert smf.decode_division(SMPTE_25_40) == (25.0, 40)
        assert smf.decode_division(SMPTE_2997_10) == (29.97, 10)
        assert smf.decode_division(SMPTE_30_80) == (30.0, 80)
        with pytest.raises(smf.MidiParseError):
            smf.decode_division((256 - 24) << 8)  # zero ticks/frame

    def test_frame_clock_timing(self):
        # fps 24 x 8 tpf = 192 ticks/s: a note [96, 288) = [0.5s, 1.5s)
        data = _smf_bytes(0, SMPTE_24_8, [
            _track([(96, _on(0, 60)), (288, _off(0, 60))]),
        ])
        py, nat = _both_parsers(data)
        _assert_same(py, nat)
        assert py.smpte == (24.0, 8)
        (n,) = py.instruments[0].notes
        assert n.start == pytest.approx(0.5) and n.end == pytest.approx(1.5)
        # resolution reports the tick rate (ticks/second) for SMPTE files
        assert py.resolution == 192

    def test_tempo_meta_does_not_affect_timing(self):
        # same note, but a 240bpm tempo meta: SMPTE timing ignores it (SMF
        # spec) while the advisory BPM map surfaces it for the tensorizer
        data = _smf_bytes(0, SMPTE_24_8, [
            _track([
                (0, _tempo(250000)),  # 240 bpm
                (96, _on(0, 60)), (288, _off(0, 60)),
            ]),
        ])
        py, nat = _both_parsers(data)
        _assert_same(py, nat)
        (n,) = py.instruments[0].notes
        assert n.start == pytest.approx(0.5) and n.end == pytest.approx(1.5)
        times, bpm = py.get_tempo_changes()
        assert bpm == [240.0] and times == [0.0]

    def test_default_advisory_tempo_is_120(self):
        data = _smf_bytes(0, SMPTE_30_80, [
            _track([(0, _on(0, 64)), (2400, _off(0, 64))]),
        ])
        py, nat = _both_parsers(data)
        _assert_same(py, nat)
        assert py.get_tempo_changes() == ([0.0], [120.0])
        (n,) = py.instruments[0].notes
        assert n.end == pytest.approx(1.0)  # 2400 / (30*80)

    def test_drop_frame_rate(self):
        data = _smf_bytes(0, SMPTE_2997_10, [
            _track([(0, _on(0, 60)), (2997, _off(0, 60))]),
        ])
        py, nat = _both_parsers(data)
        _assert_same(py, nat)
        (n,) = py.instruments[0].notes
        assert n.end == pytest.approx(2997 / (29.97 * 10))

    def test_smpte_file_imports_through_tensorizer(self, tmp_path):
        """An SMPTE file must not be skipped by the dataset builder: notes on
        a 120bpm sixteenth grid tensorize exactly like their PPQ twin."""
        from midi_vae_tpu.config import Config
        from midi_vae_tpu.data.tensorize import load_rolls_from_path

        cfg = Config()
        rate = 24 * 8  # ticks per second
        # sixteenths at 120bpm are 0.125 s = 24 ticks
        events = []
        for i, pitch in enumerate([60, 62, 64, 65] * 4):
            t0 = i * 24
            events.append((t0, _on(0, pitch)))
            events.append((t0 + 24, _off(0, pitch)))
        data = _smf_bytes(0, SMPTE_24_8, [_track(events)])
        p = tmp_path / "smpte.mid"
        p.write_bytes(data)
        out = load_rolls_from_path(str(p), cfg)
        assert out is not None
        assert out.tempo == pytest.approx(120.0)
        assert out.X.shape[0] >= 1  # produced at least one window


class TestFormatSemantics:
    def test_format0_multichannel(self):
        # one track, two channels with different programs
        data = _smf_bytes(0, 480, [
            _track([
                (0, _tempo(500000)),
                (0, bytes([0xC0, 5])), (0, bytes([0xC1, 33])),
                (0, _on(0, 60)), (480, _off(0, 60)),
                (0, _on(1, 40)), (960, _off(1, 40)),
            ]),
        ])
        py, nat = _both_parsers(data)
        _assert_same(py, nat)
        assert py.format == 0
        assert sorted(i.program for i in py.instruments) == [5, 33]

    def test_format1_tempo_on_nonzero_track_ignored(self):
        """pretty_midi honors tempo/timesig from track 0 only; a tempo meta
        on a note track must not change timing (default 120bpm rules)."""
        data = _smf_bytes(1, 480, [
            _track([(0, _timesig(4, 2))]),  # meta track, no tempo
            _track([
                (0, _tempo(250000)),  # 240bpm -- must be IGNORED
                (0, _on(0, 60)), (480, _off(0, 60)),
            ]),
        ])
        py, nat = _both_parsers(data)
        _assert_same(py, nat)
        assert py.get_tempo_changes() == ([0.0], [120.0])
        (n,) = py.instruments[0].notes
        assert n.end == pytest.approx(0.5)  # one quarter at 120bpm

    def test_format1_midnote_tempo_change_across_tracks(self):
        """A track-0 tempo change in the middle of a held note on ANOTHER
        track must stretch that note's tail (and both parsers must agree
        bit-for-bit on the resulting float seconds)."""
        data = _smf_bytes(1, 480, [
            _track([(0, _tempo(500000)), (480, _tempo(1000000))]),
            _track([(0, _on(0, 60)), (960, _off(0, 60))]),
        ])
        py, nat = _both_parsers(data)
        _assert_same(py, nat)
        (n,) = py.instruments[0].notes
        # first quarter at 120bpm (0.5 s) + second quarter at 60bpm (1.0 s)
        assert n.end == pytest.approx(1.5)

    def test_format2_parses_with_track0_tempo(self):
        """Format 2 (independent patterns): decided semantics -- parse all
        tracks on one timeline with track-0 tempo only, exactly like
        formats 0/1 (pretty_midi applies the same uniform handling)."""
        data = _smf_bytes(2, 480, [
            _track([(0, _tempo(500000)), (0, _on(0, 60)), (480, _off(0, 60))]),
            _track([(0, _tempo(250000)), (0, _on(0, 72)), (480, _off(0, 72))]),
        ])
        py, nat = _both_parsers(data)
        _assert_same(py, nat)
        assert py.format == 2
        assert len(py.instruments) == 2
        # both tracks timed by track 0's 120bpm map
        for inst in py.instruments:
            assert inst.notes[0].end == pytest.approx(0.5)

    def test_zero_length_track(self):
        """A zero-length MTrk among real tracks parses cleanly (and still
        counts as track 0 for the tempo-source rule when first)."""
        empty = b"MTrk" + struct.pack(">I", 0)
        data = _smf_bytes(1, 480, [
            empty,
            _track([(0, _on(0, 60)), (480, _off(0, 60))]),
        ])
        py, nat = _both_parsers(data)
        _assert_same(py, nat)
        assert py.get_tempo_changes() == ([0.0], [120.0])
        assert len(py.instruments) == 1

    def test_non_44_time_signatures(self):
        data = _smf_bytes(1, 480, [
            _track([
                (0, _tempo(500000)), (0, _timesig(7, 3)),   # 7/8
                (960, _timesig(3, 2)),                       # 3/4
            ]),
            _track([(0, _on(0, 60)), (480, _off(0, 60))]),
        ])
        py, nat = _both_parsers(data)
        _assert_same(py, nat)
        sigs = [(t.numerator, t.denominator) for t in py.time_signature_changes]
        assert sigs == [(7, 8), (3, 4)]
        assert py.time_signature_changes[1].time == pytest.approx(1.0)


class TestSmpteRendererRoundTrip:
    def test_roundtrip_via_writer(self, tmp_path):
        """A parsed SMPTE file re-written by the (PPQ) writer preserves note
        seconds: the sealed artifact path never re-emits SMPTE."""
        data = _smf_bytes(0, SMPTE_25_40, [
            _track([(0, _tempo(500000)),
                    (500, _on(0, 65)), (1500, _off(0, 65))]),
        ])
        py = smf.parse_midi_bytes(data)
        p = tmp_path / "out.mid"
        smf.write_midi(py, str(p))
        back = smf.read_midi(str(p))
        assert back.smpte is None
        (n,) = back.instruments[0].notes
        (m,) = py.instruments[0].notes
        assert n.start == pytest.approx(m.start, abs=2e-3)
        assert n.end == pytest.approx(m.end, abs=2e-3)


class TestParserAgreementFuzz:
    def test_random_division_format_fuzz(self):
        """Randomized division/format/track-layout fuzz: the two parsers
        must agree bit-for-bit on every file."""
        rng = np.random.RandomState(7)
        divisions = [96, 480, 960, SMPTE_24_8, SMPTE_25_40, SMPTE_2997_10,
                     SMPTE_30_80]
        for trial in range(40):
            fmt = int(rng.choice([0, 1, 2]))
            division = int(divisions[rng.randint(len(divisions))])
            ntracks = 1 if fmt == 0 else int(rng.randint(1, 4))
            tracks = []
            for t in range(ntracks):
                events = []
                if rng.random() < 0.7:
                    events.append((0, _tempo(int(rng.randint(200000, 1200000)))))
                if rng.random() < 0.3:
                    events.append(
                        (int(rng.randint(0, 2000)),
                         _tempo(int(rng.randint(200000, 1200000))))
                    )
                if rng.random() < 0.4:
                    events.append((0, _timesig(int(rng.randint(1, 13)),
                                               int(rng.randint(0, 5)))))
                for _ in range(int(rng.randint(1, 12))):
                    ch = int(rng.randint(0, 16))
                    pitch = int(rng.randint(20, 100))
                    t0 = int(rng.randint(0, 4000))
                    dur = int(rng.randint(1, 2000))
                    events.append((t0, _on(ch, pitch, int(rng.randint(1, 128)))))
                    events.append((t0 + dur, _off(ch, pitch)))
                tracks.append(_track(events))
            data = _smf_bytes(fmt, division, tracks)
            py, nat = _both_parsers(data)
            _assert_same(py, nat)

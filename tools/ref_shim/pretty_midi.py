"""pretty_midi API shim backed by this framework's own SMF layer.

Purpose: run the REFERENCE tensorizer (/root/reference/import_midi.py,
/root/reference/midi_functions.py) unmodified in this image -- where the real
pretty_midi is not installed -- so its outputs can be bit-compared against
``midi_vae_tpu.data.tensorize``. The reference touches only a small slice of
pretty_midi's surface (import_midi.py:18,30,32,58-75,99-156;
midi_functions.py:66-122):

    PrettyMIDI(path) / PrettyMIDI(initial_tempo=..., resolution=...)
    .get_tempo_changes() -> (times_sec, bpm) arrays
    .get_end_time() -> float seconds
    .time_signature_changes (list, appendable)
    .instruments (list of Instrument, reorderable/replaceable)
    .write(path)
    Instrument(program=...) with .notes/.program/.is_drum
    Instrument.get_piano_roll(fs) -> (128, frames) velocity-summed roll,
        frames = int(fs * end_of_instrument); all-zero for drums
    Note(velocity=, pitch=, start=, end=) with mutable attributes
    TimeSignature(numerator, denominator, time)

Known subset limitation (documented, irrelevant for corpora produced by
``tools/make_demo_corpus.py``): real pretty_midi extends notes through
sustain-pedal (CC64) events inside ``get_piano_roll``; this shim -- like the
framework's SMF layer -- ignores controller events entirely.

This module is NOT reference code: it is a from-scratch adapter over
``midi_vae_tpu.data.smf`` exposing pretty_midi's call signatures.
"""

from __future__ import annotations

import os
import sys

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from midi_vae_tpu.data import smf as _smf  # noqa: E402


class Note:
    """Mutable note record (the reference rebinds .start/.end in place,
    import_midi.py:62-66)."""

    def __init__(self, velocity: int, pitch: int, start: float, end: float):
        self.velocity = velocity
        self.pitch = pitch
        self.start = start
        self.end = end

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return (
            f"Note(start={self.start:.6f}, end={self.end:.6f}, "
            f"pitch={self.pitch}, velocity={self.velocity})"
        )


class TimeSignature:
    def __init__(self, numerator: int, denominator: int, time: float):
        self.numerator = numerator
        self.denominator = denominator
        self.time = time


class Instrument:
    def __init__(self, program: int = 0, is_drum: bool = False, name: str = ""):
        self.program = program
        self.is_drum = is_drum
        self.name = name
        self.notes: list[Note] = []

    def get_end_time(self) -> float:
        return max((n.end for n in self.notes), default=0.0)

    def get_piano_roll(self, fs: float = 100, times=None) -> np.ndarray:
        """pretty_midi.Instrument.get_piano_roll semantics (no-CC64 subset):
        (128, int(fs*end)) array, velocities SUMMED over overlapping notes,
        note spans [int(start*fs), int(end*fs)); drums produce zeros."""
        if not self.notes:
            return np.zeros((128, 0))
        frames = int(fs * self.get_end_time())
        roll = np.zeros((128, frames))
        if self.is_drum:
            return roll
        for n in self.notes:
            roll[n.pitch, int(n.start * fs):int(n.end * fs)] += n.velocity
        return roll


class PrettyMIDI:
    def __init__(self, midi_file: str | None = None, resolution: int = 220,
                 initial_tempo: float = 120.0):
        if midi_file is not None:
            mid = _smf.read_midi(midi_file)
            times, bpm = mid.get_tempo_changes()
            self._tempo_times = np.asarray(times, dtype=float)
            self._tempo_bpm = np.asarray(bpm, dtype=float)
            self.resolution = mid.resolution
            self.time_signature_changes = [
                TimeSignature(ts.numerator, ts.denominator, ts.time)
                for ts in mid.time_signature_changes
            ]
            self.instruments = []
            for inst in mid.instruments:
                shim = Instrument(inst.program, inst.is_drum, inst.name)
                shim.notes = [
                    Note(n.velocity, n.pitch, n.start, n.end) for n in inst.notes
                ]
                self.instruments.append(shim)
        else:
            self._tempo_times = np.array([0.0])
            self._tempo_bpm = np.array([float(initial_tempo)])
            self.resolution = resolution
            self.time_signature_changes: list[TimeSignature] = []
            self.instruments: list[Instrument] = []

    def get_tempo_changes(self):
        return self._tempo_times, self._tempo_bpm

    def get_end_time(self) -> float:
        return max((i.get_end_time() for i in self.instruments), default=0.0)

    def write(self, path: str) -> None:
        mid = _smf.MidiFile(
            initial_tempo=float(self._tempo_bpm[0]), resolution=self.resolution
        )
        mid.set_tempo_changes(
            [float(t) for t in self._tempo_times],
            [float(b) for b in self._tempo_bpm],
        )
        mid.time_signature_changes = [
            _smf.TimeSignature(ts.numerator, ts.denominator, ts.time)
            for ts in self.time_signature_changes
        ]
        for inst in self.instruments:
            out = _smf.Instrument(inst.program, inst.is_drum, inst.name)
            out.notes = [
                _smf.Note(n.pitch, n.velocity, n.start, n.end) for n in inst.notes
            ]
            mid.instruments.append(out)
        _smf.write_midi(mid, path)

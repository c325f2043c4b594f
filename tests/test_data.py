"""Data-layer tests: SMF I/O, tensorizer invariants, dataset building.

These encode the reference's inline asserts (import_midi.py:251-265 one-hot /
monophonicity invariants, velocity scaling <= 1) as a real test suite
(SURVEY.md §4).
"""

import os

import numpy as np
import pytest

from midi_vae_tpu.config import Config
from midi_vae_tpu.data import smf, tensorize
from midi_vae_tpu.data.dataset import import_midi_from_folder


def make_midi(notes_per_program, bpm=120.0, resolution=480):
    """notes_per_program: {program: [(pitch, velocity, start_s, end_s), ...]}"""
    mid = smf.MidiFile(initial_tempo=bpm, resolution=resolution)
    for program, notes in notes_per_program.items():
        inst = smf.Instrument(program=program)
        for pitch, vel, start, end in notes:
            inst.notes.append(smf.Note(pitch, vel, start, end))
        mid.instruments.append(inst)
    return mid


class TestConfig:
    def test_reference_default_dims(self):
        cfg = Config()
        assert cfg.num_classes == 2
        assert cfg.new_num_notes == 60
        assert cfg.input_dim == 61  # models/JvP/params.txt input_dim: 61
        assert cfg.output_dim == 61
        assert cfg.input_length == 64  # 16 * max_voices (settings.py:140)
        assert cfg.output_length == 64
        assert cfg.instrument_dim == 16
        assert cfg.num_composers == 2
        assert cfg.meta_instrument_length == 4

    def test_json_roundtrip(self, tmp_path):
        cfg = Config(classes=("Bach", "Mozart"), beta=0.05, lstm_size=128)
        p = str(tmp_path / "config.json")
        cfg.save(p)
        cfg2 = Config.load(p)
        assert cfg2 == cfg

    def test_song_completion_dims(self):
        cfg = Config(song_completion=True)
        assert cfg.input_length == 16
        assert cfg.output_length == 64

    def test_invalid(self):
        with pytest.raises(ValueError):
            Config(beta=0.0)
        with pytest.raises(ValueError):
            Config(cell_type="Transformer")

    def test_parse_overrides(self):
        """The shared --set parser: literal values, bare strings, clean
        errors on malformed pairs and unknown Config fields."""
        from midi_vae_tpu.config import parse_overrides

        assert parse_overrides([]) == {}
        assert parse_overrides(
            ["lstm_size=512", "compute_dtype=bfloat16", "beta=0.1"]
        ) == {"lstm_size": 512, "compute_dtype": "bfloat16", "beta": 0.1}
        with pytest.raises(SystemExit, match="key=value"):
            parse_overrides(["lstm_size"])
        with pytest.raises(SystemExit, match="unknown Config field"):
            parse_overrides(["no_such_flag=1"])

    def test_classes_string_normalized(self):
        """--set classes=style1,style2 reaches Config as a plain string;
        tuple() would silently iterate it into 13 one-character classes.
        __post_init__ must split on commas instead."""
        cfg = Config(classes="style1,style2")
        assert cfg.classes == ("style1", "style2")
        assert cfg.num_classes == 2
        cfg = Config(classes=" Jazz , Pop ")
        assert cfg.classes == ("Jazz", "Pop")
        cfg = Config(classes=["Bach", "Mozart"])  # lists normalize to tuples
        assert cfg.classes == ("Bach", "Mozart")
        with pytest.raises(ValueError, match="classes"):
            Config(classes="")

    def test_include_composer_feature_rejected(self):
        """Dead reference flag (settings.py:128-129): widens input_dim but
        nothing appends the composer one-hot -- enabling it must error."""
        with pytest.raises(ValueError, match="include_composer_feature"):
            Config(include_composer_feature=True)

    def test_gate_activation_validated(self):
        """'sigmoid' (default, Pallas-kernel path) and 'hard_sigmoid'
        (bit-faithful Keras-2.0.8 gates, scan path) are the only values."""
        assert Config().gate_activation == "sigmoid"
        assert Config(gate_activation="hard_sigmoid").gate_activation == (
            "hard_sigmoid"
        )
        with pytest.raises(ValueError, match="gate_activation"):
            Config(gate_activation="tanh")

    def test_vae_loss_validated(self):
        """The notes-head loss selector (vae_definition.py:338): xent
        (shipped default) and mse are supported; anything else errors
        instead of being silently ignored."""
        assert Config(vae_loss="mse").vae_loss == "mse"
        assert Config(vae_loss="mean_squared_error") is not None
        with pytest.raises(ValueError, match="vae_loss"):
            Config(vae_loss="hinge")

    def test_probe_activations_softmax_only(self):
        """The adversarial-probe activations (settings.py:197,200) ship as
        softmax and the xent probe losses assume it; other values error."""
        with pytest.raises(ValueError, match="softmax"):
            Config(composer_decoder_at_notes_activation="sigmoid")
        with pytest.raises(ValueError, match="softmax"):
            Config(composer_decoder_at_instrument_activation="tanh")


class TestSMF:
    def test_roundtrip(self, tmp_path):
        mid = make_midi({0: [(60, 90, 0.0, 0.5), (64, 70, 0.5, 1.0)],
                         40: [(48, 100, 0.0, 2.0)]})
        path = str(tmp_path / "song.mid")
        mid.write(path)
        back = smf.read_midi(path)
        assert len(back.instruments) == 2
        by_prog = {i.program: i for i in back.instruments}
        assert set(by_prog) == {0, 40}
        notes = sorted(by_prog[0].notes, key=lambda n: n.start)
        assert [n.pitch for n in notes] == [60, 64]
        assert abs(notes[0].start - 0.0) < 1e-3
        assert abs(notes[0].end - 0.5) < 1e-3
        assert notes[0].velocity == 90
        times, bpm = back.get_tempo_changes()
        assert len(times) == 1 and abs(bpm[0] - 120.0) < 1e-6

    def test_tempo_changes(self, tmp_path):
        # hand-build a file with two tempi to exercise the tempo map
        mid = make_midi({0: [(60, 90, 0.0, 8.0)]}, bpm=120.0)
        path = str(tmp_path / "t.mid")
        mid.write(path)
        back = smf.read_midi(path)
        assert abs(back.get_end_time() - 8.0) < 1e-3

    def test_note_on_zero_velocity_is_off(self, tmp_path):
        # craft raw bytes: note_on, then note_on vel 0
        import struct
        body = b""
        body += bytes([0x00, 0xC0, 0x00])
        body += bytes([0x00, 0x90, 60, 100])
        body += bytes([0x60, 0x90, 60, 0])  # 96 ticks later, vel 0 == off
        body += bytes([0x00, 0xFF, 0x2F, 0x00])
        track = b"MTrk" + struct.pack(">I", len(body)) + body
        header = b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
        p = tmp_path / "raw.mid"
        p.write_bytes(header + track)
        back = smf.read_midi(str(p))
        assert len(back.instruments) == 1
        (note,) = back.instruments[0].notes
        assert note.pitch == 60 and abs(note.end - 0.5) < 1e-6  # 96 ticks @120


class TestInstrumentMatrix:
    @pytest.mark.parametrize("method", ["1hot-category", "1hot-instrument"])
    def test_onehot_roundtrip(self, method):
        programs = [0, 25, 40, 73]
        I = tensorize.programs_to_instrument_matrix(programs, method, 4)
        assert I.shape[0] == 4
        assert np.all(I.sum(axis=1) == 1)
        back = tensorize.instrument_matrix_to_programs(I, method)
        if method == "1hot-instrument":
            assert back == programs
        else:
            assert back == [(p // 8) * 8 for p in programs]

    def test_khot_category(self):
        I = tensorize.programs_to_instrument_matrix([25], "khot-category", 4)
        # program 25 -> category 3 -> bits 0b0011
        assert list(I[0]) == [1, 1, 0, 0]
        back = tensorize.instrument_matrix_to_programs(I[:1], "khot-category")
        assert back == [24]

    def test_missing_voices_are_zero(self):
        I = tensorize.programs_to_instrument_matrix([0], "1hot-category", 4)
        assert I[1:].sum() == 0


class TestLoadRolls:
    def cfg(self, **kw):
        return Config(**kw)

    def test_basic_monophonic(self):
        # 120bpm, SMALLEST_NOTE=16 -> fs=8 ticks/s; quarter=0.5s, 16th=0.125s
        cfg = self.cfg()
        notes = [(60, 100, 0.0, 0.125), (62, 100, 0.125, 0.25), (64, 100, 0.25, 0.5)]
        mid = make_midi({0: notes})
        song = tensorize.load_rolls(mid, cfg)
        assert song is not None
        X, Y, I, V, D = song.X, song.Y, song.I, song.V, song.D
        assert Y.shape[1:] == (64, 61)
        assert X.shape == Y.shape
        # every unrolled row one-hot (incl. silent)
        flat = Y.reshape(-1, 61)
        assert np.all(flat.sum(axis=1) == 1)
        # voice 0 of step 0 = pitch 60 -> index 60-24=36
        assert flat[0, 36] == 1
        # voices 1..3 of step 0 silent
        assert flat[1, 60] == 1 and flat[2, 60] == 1 and flat[3, 60] == 1
        # step 1 (row 4) = pitch 62
        assert flat[4, 38] == 1
        # velocity scaled: 0.5 + (100/127)*0.5
        np.testing.assert_allclose(
            V.reshape(-1)[0], 0.5 + (100 / 127) * 0.5, rtol=1e-6
        )
        assert V.reshape(-1).max() <= 1.0
        # note 3 spans ticks 2..4: start not held, tick 3 held
        flatD = D.reshape(-1)
        assert flatD[2 * 4] == 0 and flatD[3 * 4] == 1
        assert I.shape == (4, 16) and I[0, 0] == 1

    def test_polyphony_split_highest_first(self):
        cfg = self.cfg()
        # chord C4+E4+G4 for one quarter note
        notes = [(60, 90, 0.0, 0.5), (64, 80, 0.0, 0.5), (67, 70, 0.0, 0.5)]
        mid = make_midi({0: notes})
        song = tensorize.load_rolls(mid, cfg)
        flat = song.Y.reshape(-1, 61)
        # voice 0 = highest pitch (67->43), voice 1 = 64->40, voice 2 = 60->36
        assert flat[0, 67 - 24] == 1
        assert flat[1, 64 - 24] == 1
        assert flat[2, 60 - 24] == 1
        assert flat[3, 60] == 1  # silent
        # voice-count override: single track with 3 concurrent -> gets 3 voices
        assert song.I[0, 0] == 1 and song.I[1, 0] == 1 and song.I[2, 0] == 1

    def test_pitch_crop(self):
        cfg = self.cfg()
        # pitch 100 >= high_crop=84 must vanish; pitch 20 < low_crop=24 too
        mid = make_midi({0: [(100, 90, 0.0, 0.5), (20, 90, 0.5, 1.0)]})
        song = tensorize.load_rolls(mid, cfg)
        flat = song.Y.reshape(-1, 61)
        assert np.all(flat[:, :60].sum(axis=1) == 0)
        assert np.all(flat[:, 60] == 1)  # everything silent

    def test_quantization_edge(self):
        cfg = self.cfg()
        # a note starting off-grid whose rounded span is empty is dropped
        # (import_midi.py:122): tick=0.125s; 0.3..0.45 ticks rounds to [0,0)
        mid = make_midi({0: [(60, 90, 0.0375, 0.05625), (72, 90, 0.5, 1.0)]})
        song = tensorize.load_rolls(mid, cfg)
        flat = song.Y.reshape(-1, 61)
        assert flat[:, 60 - 24].sum() == 0  # dropped
        assert flat[:, 72 - 24].sum() > 0

    def test_windowing_pads_with_silence(self):
        cfg = self.cfg()
        # 5 sixteenths of sound -> 20 unrolled rows -> pad to 64
        mid = make_midi({0: [(60, 90, 0.0, 0.625)]})
        song = tensorize.load_rolls(mid, cfg)
        assert song.Y.shape == (1, 64, 61)
        flat = song.Y.reshape(-1, 61)
        assert np.all(flat.sum(axis=1) == 1)  # padding marked silent
        assert flat[-1, 60] == 1

    def test_two_instruments(self):
        cfg = self.cfg()
        mid = make_midi({
            0: [(60, 90, 0.0, 1.0)],                      # 8 ticks active
            40: [(50, 90, 0.0, 2.0)],                      # 16 ticks -> more active
        })
        song = tensorize.load_rolls(mid, cfg)
        # instrument 40 (strings, cat 5) is busier -> voice 0
        assert song.I[0, 5] == 1
        assert song.I[1, 0] == 1
        flat = song.Y.reshape(-1, 61)
        assert flat[0, 50 - 24] == 1  # voice 0 row = strings pitch
        assert flat[1, 60 - 24] == 1  # voice 1 row = piano pitch

    # ---- adversarial goldens: hand-computed reference semantics for the
    # fiddly edge cases (import_midi.py:69-75, :94-152) ----

    def test_overlapping_same_pitch_notes(self):
        """Two overlapping notes on the SAME pitch (import_midi.py:115-129):
        the active roll is their union, per-note +1 makes max_concurrent 2,
        but voice-splitting sees ONE distinct pitch, so voice 1 stays silent;
        the second onset re-articulates (held=0) with its own velocity."""
        cfg = self.cfg()
        # 120bpm -> tick=0.125s. A: ticks 0-4 vel 80; B: ticks 2-6 vel 120.
        mid = make_midi({0: [(60, 80, 0.0, 0.5), (60, 120, 0.25, 0.75)]})
        song = tensorize.load_rolls(mid, cfg)
        flat = song.Y.reshape(-1, 61)
        flatV = song.V.reshape(-1)
        flatD = song.D.reshape(-1)
        # union: pitch 60 active ticks 0..5 on voice 0
        for step in range(6):
            assert flat[step * 4, 60 - 24] == 1, step
        assert flat[6 * 4, 60] == 1  # silent after
        # voice 1 never sounds (one distinct pitch despite concurrency 2)
        for step in range(6):
            assert flat[step * 4 + 1, 60] == 1, step
        # re-articulation at tick 2: not held, velocity = note B's
        scale = lambda v: 0.5 + (v / 127) * 0.5  # noqa: E731
        np.testing.assert_allclose(flatV[0], scale(80), rtol=1e-6)
        assert flatV[1 * 4] == 0 and flatD[1 * 4] == 1          # held
        np.testing.assert_allclose(flatV[2 * 4], scale(120), rtol=1e-6)
        assert flatD[2 * 4] == 0                                 # restart
        assert flatD[3 * 4] == 1 and flatD[5 * 4] == 1           # held again

    def test_adjacent_same_pitch_notes_rearticulate(self):
        """Note-off and note-on at the same tick (back-to-back same-pitch
        notes): the piano roll is continuous but the duration dict marks the
        second onset as a start (import_midi.py:143-148) -> held=0 there."""
        cfg = self.cfg()
        mid = make_midi({0: [(60, 90, 0.0, 0.25), (60, 90, 0.25, 0.5)]})
        song = tensorize.load_rolls(mid, cfg)
        flat = song.Y.reshape(-1, 61)
        flatD = song.D.reshape(-1)
        for step in range(4):
            assert flat[step * 4, 60 - 24] == 1
        assert flatD[0] == 0 and flatD[1 * 4] == 1   # start, held
        assert flatD[2 * 4] == 0 and flatD[3 * 4] == 1  # re-start, held

    def test_multi_tempo_longest_span_wins(self):
        """Multi-tempo file (import_midi.py:30-67): only notes fully inside
        the LONGEST steady-tempo span survive, shifted to t=0, quantized at
        that span's tempo."""
        cfg = self.cfg()
        # 2s at 120bpm, then 6s at 60bpm (longest) -> fs = 60/60/4*16 = 4/s
        mid = make_midi({0: [
            (72, 90, 0.0, 1.0),    # inside the 120bpm span: dropped
            (60, 90, 2.0, 4.0),    # inside 60bpm span -> ticks 0..8
            (64, 90, 4.0, 5.0),    # inside 60bpm span -> ticks 8..12
        ]})
        mid.set_tempo_changes([0.0, 2.0], [120.0, 60.0])
        song = tensorize.load_rolls(mid, cfg)
        assert song.tempo == 60.0
        flat = song.Y.reshape(-1, 61)
        assert flat[:, 72 - 24].sum() == 0          # cropped away
        for step in range(8):
            assert flat[step * 4, 60 - 24] == 1, step
        for step in range(8, 12):
            assert flat[step * 4, 64 - 24] == 1, step

    def test_drum_track_ordered_last(self):
        """Drums count 0 activity (pretty_midi's piano roll is all-zero for
        drums, import_midi.py:71-74) so a busy drum track still sorts AFTER
        any melodic track; its notes are then quantized normally when voices
        remain (the reference quantizes instrument.notes regardless)."""
        cfg = self.cfg()
        mid = smf.MidiFile(initial_tempo=120.0)
        drums = smf.Instrument(program=0, is_drum=True)
        for k in range(16):
            drums.notes.append(smf.Note(40, 100, k * 0.125, (k + 1) * 0.125))
        melodic = smf.Instrument(program=40)
        melodic.notes.append(smf.Note(60, 90, 0.0, 0.25))
        mid.instruments = [drums, melodic]
        song = tensorize.load_rolls(mid, cfg)
        # melodic (strings, cat 5) claims voice 0 despite 8x fewer notes
        assert song.I[0, 5] == 1
        flat = song.Y.reshape(-1, 61)
        assert flat[0, 60 - 24] == 1    # voice 0 = melodic
        assert flat[1, 40 - 24] == 1    # voice 1 = drum notes (quantized)

    def test_activity_count_same_pitch_overlap(self):
        """_activity_counts approximates pretty_midi's 100Hz nonzero-cell
        count: overlapping same-pitch notes must count their UNION of cells
        (pretty_midi sums velocities in place -- cells stay nonzero), not
        2x the span."""
        mid = make_midi({
            # union 0..0.75s = 75 cells; naive per-note sum would be 100
            0: [(60, 80, 0.0, 0.5), (60, 120, 0.25, 0.75)],
            # 80 cells, distinct pitches
            40: [(50, 90, 0.0, 0.5), (52, 90, 0.25, 0.55)],
        })
        counts = tensorize._activity_counts(mid)
        assert counts[0] == 75
        assert counts[1] == 80
        song = tensorize.load_rolls(mid, Config())
        # instrument 40 (80 cells) outranks instrument 0 (75 cells): a
        # per-note count (100 vs 80) would flip this ordering
        assert song.I[0, 5] == 1


class TestRollsToMidiRoundtrip:
    def test_roundtrip(self, tmp_path):
        cfg = Config()
        notes = [(60, 100, 0.0, 0.25), (64, 80, 0.25, 0.5), (67, 90, 0.5, 1.0)]
        mid = make_midi({0: notes}, bpm=120.0)
        song = tensorize.load_rolls(mid, cfg)
        flatY = song.Y.reshape(-1, song.Y.shape[-1])
        flatV = song.V.reshape(-1)
        flatD = song.D.reshape(-1)
        programs = tensorize.instrument_matrix_to_programs(
            song.I, cfg.instrument_attach_method
        )
        out = tensorize.rolls_to_midi(
            flatY, programs, cfg, 120.0, flatV, flatD
        )
        got = sorted(
            [(n.pitch, round(n.start, 3), round(n.end, 3)) for n in out.instruments[0].notes]
        )
        assert [g[0] for g in got] == [60, 64, 67]
        # timing preserved (16th grid at 120bpm = 0.125s)
        assert got[0][1] == 0.0 and abs(got[0][2] - 0.25) < 1e-6
        assert abs(got[2][1] - 0.5) < 1e-6 and abs(got[2][2] - 1.0) < 1e-6
        # velocities survive the scale/unscale roundtrip within rounding
        vels = {n.pitch: n.velocity for n in out.instruments[0].notes}
        assert abs(vels[60] - 100) <= 1
        assert abs(vels[64] - 80) <= 1


class TestDatasetBuilder:
    def build_corpus(self, root):
        import os

        rng = np.random.RandomState(0)
        for ci, cname in enumerate(["style1", "style2"]):
            d = root / cname
            os.makedirs(d, exist_ok=True)
            for s in range(6):
                notes = []
                t = 0.0
                for _ in range(16):
                    pitch = int(rng.randint(40 + ci * 12, 70 + ci * 12))
                    dur = 0.125 * int(rng.randint(1, 4))
                    notes.append((pitch, int(rng.randint(40, 120)), t, t + dur))
                    t += dur
                make_midi({ci * 8: notes}).write(str(d / f"s{s}.mid"))

    def test_import_and_split(self, tmp_path):
        self.build_corpus(tmp_path)
        cfg = Config()
        ds = import_midi_from_folder(str(tmp_path), cfg)
        assert ds.train_set_size + ds.test_set_size == 12
        assert ds.test_set_size == 2  # 10% of 12 rounds via sklearn -> 2
        # stratified: one test song per class
        assert sorted(ds.C_test) == [0, 1]
        for X, Y in zip(ds.X_train, ds.Y_train):
            assert X.shape == Y.shape
            assert X.shape[1:] == (64, 61)

    def test_cache(self, tmp_path):
        self.build_corpus(tmp_path)
        cfg = Config()
        cache = str(tmp_path / "cache")
        ds1 = import_midi_from_folder(str(tmp_path), cfg, cache_dir=cache)
        ds2 = import_midi_from_folder(str(tmp_path), cfg, cache_dir=cache)
        assert ds1.train_paths == ds2.train_paths
        np.testing.assert_array_equal(ds1.X_train[0], ds2.X_train[0])

    def test_equal_mini_songs(self, tmp_path):
        self.build_corpus(tmp_path)
        cfg = Config(equal_mini_songs=True)
        ds = import_midi_from_folder(str(tmp_path), cfg)
        from midi_vae_tpu.data.dataset import windows_per_song

        per_class = [0, 0]
        for Y, c in zip(ds.Y_train, ds.C_train):
            per_class[c] += windows_per_song(Y, cfg)
        # neither class may exceed the min count computed before filtering
        assert max(per_class) <= min(per_class) + max(
            windows_per_song(Y, cfg) for Y in ds.Y_train
        )


class TestMusicUtils:
    def test_khot_transform(self):
        from midi_vae_tpu.utils.music import monophonic_to_khot_pianoroll

        roll = np.zeros((8, 5))
        roll[0, 1] = 1  # step0 voice0
        roll[1, 3] = 1  # step0 voice1
        roll[4, 1] = 1  # step1 voice0
        poly = monophonic_to_khot_pianoroll(roll, 4)
        assert poly.shape == (2, 5)
        assert poly[0, 1] == 1 and poly[0, 3] == 1 and poly[1, 1] == 1

    def test_harmonicity_identical_tracks(self):
        from midi_vae_tpu.utils.music import (
            get_harmonicity_scores_for_each_track_combination,
        )

        roll = np.zeros((64, 61))
        # all 4 voices play the same pitch class
        for step in range(0, 64, 4):
            for v in range(4):
                roll[step + v, 36] = 1
        m = get_harmonicity_scores_for_each_track_combination(roll[:, :60], 4)
        assert np.allclose(np.nan_to_num(m), 0.0, atol=1e-6)

    def test_signature_vector(self):
        from midi_vae_tpu.utils.music import signature_from_pianoroll

        roll = np.zeros((16, 60))
        roll[0:4, 36] = 1  # one 4-step note
        sig = signature_from_pianoroll(roll)
        assert len(sig) == 15
        assert sig[0] == 1 / 16          # one note / 16 steps
        assert sig[1] == 4 / 16          # occupation
        assert sig[2] == 0               # no polyphony
        assert abs(sig[3] - 60 / 127) < 1e-9  # highest pitch (36+24)/127

    def test_mahalanobis(self):
        from midi_vae_tpu.utils.music import (
            get_mean_and_cov_from_vector_list,
            mahalanobis_distance,
        )

        rng = np.random.RandomState(0)
        data = rng.randn(100, 5)
        mean, cov = get_mean_and_cov_from_vector_list(data)
        d = mahalanobis_distance(mean, mean, cov)
        assert d == 0.0
        assert mahalanobis_distance(mean + 1, mean, cov) > 0


class TestVelocityThresholdRoundtrip:
    def test_nondefault_threshold_roundtrip(self):
        """Velocity scale/unscale must invert for any threshold (review fix:
        rolls_to_midi previously hardcoded the 0.5 subtract)."""
        cfg = Config(velocity_threshold=0.3)
        mid = make_midi({0: [(60, 100, 0.0, 0.25), (64, 40, 0.25, 0.5)]})
        song = tensorize.load_rolls(mid, cfg)
        flatY = song.Y.reshape(-1, song.Y.shape[-1])
        out = tensorize.rolls_to_midi(
            flatY, [0], cfg, 120.0, song.V.reshape(-1), song.D.reshape(-1)
        )
        vels = {n.pitch: n.velocity for n in out.instruments[0].notes}
        assert abs(vels[60] - 100) <= 1
        assert abs(vels[64] - 40) <= 1


class TestTensorizerModes:
    def test_include_only_monophonic_instruments(self):
        cfg = Config(include_only_monophonic_instruments=True)
        # one monophonic track + one polyphonic track (gets skipped)
        mid = make_midi({
            0: [(60, 90, 0.0, 0.5), (62, 90, 0.5, 1.0)],                 # mono
            40: [(50, 90, 0.0, 1.0), (55, 90, 0.0, 1.0)],                # poly
        })
        song = tensorize.load_rolls(mid, cfg)
        # only the monophonic piano survives
        assert song.I[0, 0] == 1           # piano category
        assert song.I[:, 5].sum() == 0     # no strings voice
        flat = song.Y.reshape(-1, 61)
        assert flat[:, 50 - 24].sum() == 0 and flat[:, 55 - 24].sum() == 0

    def test_song_completion(self):
        cfg = Config(song_completion=True)
        mid = make_midi({0: [(60, 90, 0.0, 2.0)]})
        song = tensorize.load_rolls(mid, cfg)
        # X = voice 0 rows only, windows of bars_input_length
        assert song.X.shape[1:] == (cfg.input_length, cfg.input_dim)
        assert song.Y.shape[1] == cfg.output_length
        assert cfg.input_length == 16 and cfg.output_length == 64

    def test_attach_instruments(self):
        cfg = Config(attach_instruments=True)
        assert cfg.output_dim == 61 + 16
        mid = make_midi({0: [(60, 90, 0.0, 0.5)]})
        song = tensorize.load_rolls(mid, cfg)
        assert song.Y.shape[-1] == 77
        # voice-0 rows carry the piano category bit (col 61); unchosen
        # voices have zero instrument rows, like the reference's I matrix
        flat = song.Y.reshape(-1, 77)
        unpadded = 8  # 4 sixteenths x... voice-0 rows within the real span
        assert np.all(flat[0 : 4 * cfg.max_voices : cfg.max_voices, 61] == 1)
        assert flat[1, 61] == 0
        del unpadded


class TestDatasetFilters:
    def _write(self, root, rel, notes={0: [(60, 90, 0.0, 0.5)]}):
        import os

        d = root / os.path.dirname(rel)
        os.makedirs(d, exist_ok=True)
        make_midi(notes).write(str(root / rel))

    def test_max_songs_cap(self, tmp_path):
        """The cap counts successfully IMPORTED songs (the reference's
        no_imported counter): unparseable files must not shrink the corpus."""
        for i in range(6):
            self._write(tmp_path, f"style1/s{i}.mid")
        # a corrupt file that sorts FIRST: load_rolls_from_path returns None
        (tmp_path / "style1" / "a_corrupt.mid").write_bytes(b"not a midi")
        cfg = Config(max_songs=3, classes=("style1",))
        from midi_vae_tpu.data.dataset import import_midi_from_folder

        ds = import_midi_from_folder(str(tmp_path), cfg)
        assert ds.train_set_size + ds.test_set_size == 3

    def test_include_unknown(self, tmp_path):
        self._write(tmp_path, "style1/a.mid")
        self._write(tmp_path, "other/b.mid")
        from midi_vae_tpu.data.dataset import find_midi_files

        cfg = Config(include_unknown=True)
        files = find_midi_files(str(tmp_path), cfg)
        labels = sorted(c for _, c in files)
        assert labels == [0, 2]  # unknown gets the extra class index
        cfg2 = Config()
        assert len(find_midi_files(str(tmp_path), cfg2)) == 1

    def test_only_unknown(self, tmp_path):
        self._write(tmp_path, "style1/a.mid")
        self._write(tmp_path, "other/b.mid")
        from midi_vae_tpu.data.dataset import find_midi_files

        cfg = Config(include_unknown=True, only_unknown=True)
        files = find_midi_files(str(tmp_path), cfg)
        assert [c for _, c in files] == [2]


class TestKhotInstrument:
    def test_khot_instrument_roundtrip(self):
        programs = [0, 25, 40, 127]
        I = tensorize.programs_to_instrument_matrix(programs, "khot-instrument", 4)
        back = tensorize.instrument_matrix_to_programs(I, "khot-instrument")
        assert back == programs  # complemented code + complemented inverse


class TestReleasedRunConfigs:
    """configs/*.json reproduce the reference's released runs: every
    overlapping field of each config must match that run's params.txt dump
    (/root/reference/models/*/params.txt)."""

    # params.txt name -> Config field (None = retired/derived-elsewhere, skip)
    SKIP = {
        "load_from_pickle_instead_of_midi", "pickle_load_path",
        "train_set_size", "test_set_size", "train_paths", "test_paths",
        # retired flags absent from the current reference settings.py too
        # (SURVEY.md §2.4: leftovers of an older schema)
        "instrument_pianoroll", "to_monophonic", "silent_noise",
        "noise_in_melody", "noise_factor_method", "noise_factor",
        "vae_without_log",
        # reference's params.txt records instrument_dim for the ATTACHED
        # encoding (0 when attach_instruments is off); ours is the
        # meta-instrument matrix width, asserted separately below
        "instrument_dim",
        # Keras optimizer name casing ('Adam') vs ours ('adam'): semantic
        # equivalence is asserted separately
        "optimizer",
        # decoder_additional_input(_dim) are derived properties here
        "decoder_additional_input", "decoder_additional_input_dim",
        "meta_instrument_dim", "meta_instrument_length", "signature_dim",
        "meta_held_notes_length", "meta_next_notes_output_length",
        "input_dim", "output_dim", "composer_length", "num_composers",
    }

    @pytest.mark.skipif(
        not os.path.isdir("/root/reference/models"),
        reason="reference repo not mounted",
    )
    @pytest.mark.parametrize(
        "run,name", [("JvP", "jvp"), ("CvJ", "cvj"), ("CvP", "cvp"), ("BvM", "bvm")]
    )
    def test_released_run_configs_match_params_txt(self, run, name):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = Config.load(os.path.join(repo, "configs", f"{name}.json"))
        params = {}
        with open(f"/root/reference/models/{run}/params.txt") as f:
            for line in f:
                if ": " not in line:
                    continue
                key, value = line.split(": ", 1)
                params[key.strip()] = value.strip()

        def parse(v):
            if v in ("True", "False"):
                return v == "True"
            for cast in (int, float):
                try:
                    return cast(v)
                except ValueError:
                    pass
            return v

        checked = 0
        for key, raw in params.items():
            if key in self.SKIP or raw.startswith("["):
                continue
            assert hasattr(cfg, key), f"params.txt field {key} missing on Config"
            ours = getattr(cfg, key)
            assert ours == parse(raw), f"{key}: ref={raw} ours={ours}"
            checked += 1
        assert checked >= 55

        # the derived geometry of the released runs
        assert cfg.input_dim == int(params["input_dim"]) == 61
        assert cfg.output_dim == int(params["output_dim"]) == 61
        assert cfg.meta_instrument_dim == int(params["meta_instrument_dim"])
        assert cfg.meta_instrument_length == int(params["meta_instrument_length"])
        assert cfg.signature_vector_length == int(params["signature_dim"])
        assert cfg.decoder_additional_input == (
            params["decoder_additional_input"] == "True"
        )
        assert cfg.meta_held_notes_length == int(params["meta_held_notes_length"])
        assert cfg.meta_next_notes_output_length == int(
            params["meta_next_notes_output_length"]
        )
        assert cfg.optimizer == params["optimizer"].lower()
        assert cfg.num_classes == 2

    @pytest.mark.parametrize("name", ["jvp", "cvj", "cvp", "bvm"])
    def test_released_run_configs_are_reference_strict(self, name):
        """The reproduction configs must carry reference semantics, not the
        framework's convergence-equivalent optimizations: the reference
        re-encodes every train song per epoch for the decoder history
        (/root/reference/vae_training.py:787-798), so history_from_train_z
        (our per-window z-cache, default True) must be pinned False."""
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        import json

        raw = json.load(open(os.path.join(repo, "configs", f"{name}.json")))
        assert raw.get("history_from_train_z") is False, (
            f"configs/{name}.json must pin history_from_train_z=false "
            "(reference-strict history semantics)"
        )
        assert raw.get("decode_residual_bf16") is False, (
            f"configs/{name}.json must pin decode_residual_bf16=false "
            "(reference gradients are exact f32)"
        )
        cfg = Config.load(os.path.join(repo, "configs", f"{name}.json"))
        assert cfg.history_from_train_z is False
        assert cfg.decode_residual_bf16 is False


class TestSystemCommonEvents:
    def test_song_select_does_not_desync_parser(self, tmp_path):
        """0xF1-0xF6 system-common events carry 0-2 data bytes, not the 2
        assumed for channel events; a Song Select (0xF3, 1 byte) must not
        shift every later delta-time."""
        import struct

        def track(events: bytes) -> bytes:
            body = events + bytes([0x00, 0xFF, 0x2F, 0x00])
            return b"MTrk" + struct.pack(">I", len(body)) + body

        note = bytes(
            [0x00, 0x90, 60, 90]      # note on C4
            + [0x60, 0x80, 60, 0]     # delta 96, note off
        )
        header = b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
        clean = tmp_path / "clean.mid"
        clean.write_bytes(header + track(note))
        with_f3 = tmp_path / "f3.mid"
        # Song Select (0xF3 + 1 data byte), then Tune Request (0xF6, no
        # data), then the same note events
        with_f3.write_bytes(
            header + track(bytes([0x00, 0xF3, 0x05, 0x00, 0xF6]) + note)
        )

        a = smf.read_midi(str(clean))
        b = smf.read_midi(str(with_f3))
        na = [(n.pitch, n.velocity, n.start, n.end) for n in a.instruments[0].notes]
        nb = [(n.pitch, n.velocity, n.start, n.end) for n in b.instruments[0].notes]
        assert na == nb and len(na) == 1

    def test_truncated_meta_event(self, tmp_path):
        """A tempo meta whose declared payload lies past the end of the file
        must not crash or yield garbage tempo (the native parser previously
        read past the buffer)."""
        import struct

        body = bytes([0x00, 0x90, 60, 90, 0x60, 0x80, 60, 0])
        body += bytes([0x00, 0xFF, 0x51, 0x03])  # declares 3 bytes, has none
        track = b"MTrk" + struct.pack(">I", len(body)) + body
        header = b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
        path = tmp_path / "trunc.mid"
        path.write_bytes(header + track)
        mid = smf.read_midi(str(path))
        _, bpm = mid.get_tempo_changes()
        assert abs(bpm[0] - 120.0) < 1e-6  # default, not garbage
        assert len(mid.instruments) == 1


class TestConfigFromDict:
    def test_string_classes_normalized(self):
        """from_dict must leave a string 'classes' for __post_init__'s
        comma-split (tuple('a,b') would char-split into 3 classes)."""
        cfg = Config.from_dict({"classes": "style1,style2"})
        assert cfg.classes == ("style1", "style2")

    def test_unknown_keys_warn_not_crash(self, capsys):
        cfg = Config.from_dict({"classes": ["a", "b"], "fused_train_encodr": False})
        assert cfg.num_classes == 2
        assert "unknown config fields" in capsys.readouterr().out

    def test_crop_bounds_validated(self):
        with pytest.raises(ValueError, match="high_crop"):
            Config(high_crop=24, low_crop=84)


class TestHardDemoCorpus:
    """The --hard demo-corpus mode must actually carry the real-music
    statistics it advertises (tempo changes, drums, velocity phrasing,
    humanized onsets) AND survive the import pipeline — it feeds the
    per-head reconstruction study (EVAL_REPORT), so a silent regression
    to easy statistics would quietly inflate those tables."""

    @pytest.fixture(scope="class")
    def hard_corpus(self, tmp_path_factory):
        from conftest import tools_module

        mod = tools_module("make_demo_corpus")
        d = tmp_path_factory.mktemp("hardcorpus")
        rng = np.random.RandomState(11)
        songs = []
        for name, style in list(mod.STYLES.items())[:2]:
            sdir = d / name
            sdir.mkdir()
            for i in range(3):
                song = mod.make_song_hard(style, rng)
                song.write(str(sdir / f"{name}_{i:03d}.mid"))
                songs.append(song)
        return d, songs

    def test_tempo_changes_present(self, hard_corpus):
        _, songs = hard_corpus
        n_multi = 0
        for song in songs:
            times, bpms = song.get_tempo_changes()
            assert len(bpms) >= 1
            if len(bpms) >= 2:
                n_multi += 1
                assert times[0] == 0.0
                assert all(t2 > t1 for t1, t2 in zip(times, times[1:]))
        assert n_multi == len(songs)  # every hard song has >=1 mid-song change

    def test_drum_track_present_and_on_channel_10(self, hard_corpus):
        d, songs = hard_corpus
        for song in songs:
            drums = [i for i in song.instruments if i.is_drum]
            assert len(drums) == 1 and len(drums[0].notes) > 0
        # survives a write/read round trip (channel 9 0-based = GM ch 10)
        first = next((d / "style1").glob("*.mid"))
        back = smf.read_midi(str(first))
        assert any(i.is_drum and i.notes for i in back.instruments)

    def test_velocity_phrasing_is_continuous(self, hard_corpus):
        _, songs = hard_corpus
        for song in songs:
            vels = [n.velocity for i in song.instruments for n in i.notes]
            # a 2-level corpus has ~2 distinct values; phrasing arcs +
            # accents + jitter must produce a rich, wide distribution
            assert len(set(vels)) > 20
            assert np.std(vels) > 5.0

    def test_onsets_are_humanized_off_grid(self, hard_corpus):
        _, songs = hard_corpus
        for song in songs:
            melodic = [i for i in song.instruments if not i.is_drum]
            starts = np.array([n.start for i in melodic for n in i.notes])
            _, bpms = song.get_tempo_changes()
            step = 60.0 / bpms[0] / 4.0
            frac = np.abs((starts / step) - np.round(starts / step))
            # gaussian 12ms jitter: most onsets NOT exactly on the grid
            assert (frac > 1e-6).mean() > 0.8

    def test_imports_through_pipeline(self, hard_corpus):
        d, _ = hard_corpus
        cfg = Config(test_fraction=0.34)
        data = import_midi_from_folder(str(d), cfg, cache_dir=None)
        X = np.concatenate(data.X_train + data.X_test, axis=0)
        assert X.shape[1:] == (
            cfg.output_length, cfg.new_num_notes + cfg.silent_dim
        )
        assert np.all(X.sum(axis=-1) == 1.0)  # one-hot incl. silent column

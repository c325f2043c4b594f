"""Evaluation-layer tests: sampling semantics, sweep statistics, generation
helpers, and an end-to-end harness run on a tiny model + synthetic dataset."""

import numpy as np
import jax
import pytest

from midi_vae_tpu.config import Config, small_test_config
from midi_vae_tpu.evaluation import sampling, sweep
from midi_vae_tpu.evaluation.generation import (
    GenerationContext,
    linear_interpolation,
    slerp,
    vote_for_programs,
)
from midi_vae_tpu.models import MidiVAE


class TestSampling:
    def test_sample_vector_argmax(self):
        v = np.array([0.1, 0.7, 0.2])
        assert sampling.sample_vector(v, "argmax") == 1
        assert sampling.sample_vector(np.zeros(3), "argmax") == 0  # empty -> 0

    def test_sample_vector_choice_temperature(self):
        rng = np.random.RandomState(0)
        v = np.array([0.01, 0.98, 0.01])
        picks = [
            sampling.sample_vector(v, "choice", temperature=0.1, rng=rng)
            for _ in range(50)
        ]
        assert np.mean(np.asarray(picks) == 1) > 0.9

    def test_notes_prediction_silent_handling(self):
        cfg = Config()
        probs = np.zeros((2, 61))
        probs[0, 10] = 1.0   # pitch
        probs[1, 60] = 1.0   # silent class -> empty row
        out = sampling.sample_notes_prediction(probs, "argmax", cfg)
        assert out.shape == (2, 60)
        assert out[0, 10] == 1 and out[1].sum() == 0

    def test_process_decoder_outputs_defaults(self):
        cfg = Config(meta_instrument=False, meta_velocity=False)
        T = cfg.output_length
        notes = np.zeros((2, T, 61))
        notes[..., 5] = 1.0
        Y, I, V, D, N = sampling.process_decoder_outputs(
            {"notes": notes}, "argmax", cfg
        )
        assert Y.shape == (2 * T, 60)
        assert I.shape == (2, 4, 16) and I[:, :, 0].all()  # default all-piano
        assert np.allclose(V, 0.75)                         # default velocity
        assert D.shape == (2 * T,)

    def test_velocity_override(self):
        cfg = Config()
        T = cfg.output_length
        notes = np.zeros((1, T, 61))
        notes[0, :, 30] = 1.0            # same pitch everywhere
        vel = np.full((1, T, 1), 0.9)
        vel[0, 2] = 0.1                   # silent velocity on a pitch step
        Y, I, V, D, _ = sampling.process_decoder_outputs(
            {"notes": notes, "velocity": vel}, "argmax", cfg
        )
        # step 2 keeps low velocity because pitch equals previous (held)
        assert V[2] < cfg.velocity_threshold
        # D derived from velocity: loud steps are note starts
        assert D[0] == 0 and D[2] == 1

    def test_add_silent_column(self):
        cfg = Config()
        Y = np.zeros((3, 60))
        Y[0, 5] = 1
        out = sampling.add_silent_column(Y, cfg)
        assert out.shape == (3, 61)
        assert out[0, 60] == 0 and out[1, 60] == 1 and out[2, 60] == 1


class TestSweepStats:
    def test_strength_probability_ascending(self):
        s, p, d = sweep.get_strength_probability_direction([1, 2, 3, 4])
        assert d == "ascending" and p == 1.0 and abs(s - 1.0) < 1e-9

    def test_strength_probability_descending(self):
        s, p, d = sweep.get_strength_probability_direction([4, 3, 2, 1])
        assert d == "descending" and p == 1.0

    def test_strength_probability_noisy(self):
        s, p, d = sweep.get_strength_probability_direction([1, 3, 2, 4])
        assert 0 < p < 1

    def test_normal_distributed_values(self):
        import scipy.stats

        range_end = scipy.stats.norm.cdf(3.0, scale=1.0) - 0.5
        vals = sweep.get_normal_distributed_values(range_end, 5, 1.0, True)
        assert vals == sorted(vals)
        assert len(vals) == 9  # 5 cdf points, first is 0 (not doubled)
        assert abs(max(vals) - 3.0) < 1e-6 and abs(min(vals) + 3.0) < 1e-6

    def test_evaluate_statistic_value(self):
        lists = [[1, 1], [2, 2], [3, 3]]
        key, s, p = sweep.evaluate_statistic_value(lists, "pitch", "mean")
        assert key == "mean_pitch_ascending" and p == 1.0

    def test_evaluate_change_of_values(self):
        lists = [[0, 0], [0, 8], [8, 8]]
        key, s, p = sweep.evaluate_change_of_values(lists, "instruments")
        assert key == "total_change_of_instruments"
        assert abs(s - 0.5) < 1e-9  # 2 changes of 4 comparisons


class TestGenerationHelpers:
    def test_interpolations(self):
        a, b = np.zeros(4), np.ones(4)
        np.testing.assert_allclose(linear_interpolation(a, b, 0.25), 0.25)
        mid = slerp(np.array([1.0, 0.0]), np.array([0.0, 1.0]), 0.5)
        np.testing.assert_allclose(mid, [np.sqrt(2) / 2] * 2, rtol=1e-6)

    def test_vote_for_programs(self):
        cfg = Config()
        I = np.zeros((3, 4, 16))
        I[0, :, 0] = 1   # piano
        I[1, :, 5] = 1   # strings (program 40)
        I[2, :, 5] = 1
        programs = vote_for_programs(I, cfg)
        assert programs == [40, 40, 40, 40]


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    """Tiny trained-ish model + dataset for harness smoke tests."""
    from midi_vae_tpu.data.dataset import Dataset
    from midi_vae_tpu.utils.synthetic import synthetic_flat

    cfg = small_test_config()
    model = MidiVAE(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    # build a Dataset out of synthetic windows (3 train songs, 2 test songs)
    ds = Dataset(cfg=cfg)
    rng = np.random.RandomState(0)
    for split, n_songs in (("train", 3), ("test", 2)):
        for s in range(n_songs):
            flat = synthetic_flat(cfg, n_songs=1, windows_per_song=3, seed=s)
            getattr(ds, f"X_{split}").append(flat.X)
            getattr(ds, f"Y_{split}").append(flat.Y)
            getattr(ds, f"I_{split}").append(flat.I[0])
            getattr(ds, f"V_{split}").append(flat.V[..., 0])
            getattr(ds, f"D_{split}").append((flat.D[..., 1] > 0).astype(np.float32))
            getattr(ds, f"T_{split}").append(100.0)
            getattr(ds, f"C_{split}").append(s % cfg.num_classes)
            getattr(ds, f"{split}_paths").append(f"/tmp/{split}_{s}.mid")
    del rng
    return cfg, model, params, ds


class TestGenerationContext:
    def test_decode_batch_shapes(self, tiny_setup):
        cfg, model, params, ds = tiny_setup
        ctx = GenerationContext(cfg, model, params)
        outs = ctx.decode_batch(np.zeros((3, cfg.latent_dim), np.float32))
        assert outs["notes"].shape == (3, cfg.output_length, cfg.output_dim)
        assert outs["instrument"].shape == (3, cfg.max_voices, cfg.instrument_dim)

    def test_encode_song(self, tiny_setup):
        cfg, model, params, ds = tiny_setup
        ctx = GenerationContext(cfg, model, params)
        z = ctx.encode_song(ds.X_train[0], ds.I_train[0], ds.V_train[0], ds.D_train[0])
        assert z.shape == (3, cfg.latent_dim)

    def test_do_not_sample_in_evaluation(self, tiny_setup):
        """When True (default), eval encodes are deterministic z_mean; when
        False, the reference keeps its training epsilon at eval time
        (vae_evaluation.py:481-486) so repeated encodes differ."""
        cfg, model, params, ds = tiny_setup
        args = (ds.X_train[0], ds.I_train[0], ds.V_train[0], ds.D_train[0])
        ctx = GenerationContext(cfg, model, params)
        np.testing.assert_array_equal(ctx.encode_song(*args), ctx.encode_song(*args))
        ctx_s = GenerationContext(
            cfg.replace(do_not_sample_in_evaluation=False), model, params
        )
        za, zb = ctx_s.encode_song(*args), ctx_s.encode_song(*args)
        assert not np.array_equal(za, zb)
        # epsilon_std=0.01: samples stay close to the mean
        assert float(np.max(np.abs(za - zb))) < 0.2

    def test_style_transfer_song_matches_separate_calls(self, tiny_setup):
        """The one-dispatch serving path (encode -> z-swap -> history roll ->
        decode -> argmax fused in one jitted program) must reproduce the
        harness's separate encode_song + manual swap + decode_and_process
        exactly."""
        cfg, model, params, ds = tiny_setup
        args = (ds.X_train[0], ds.I_train[0], ds.V_train[0], ds.D_train[0])
        ctx = GenerationContext(cfg, model, params)
        z = ctx.encode_song(*args)
        C, C_switch = 0, 1
        switched = np.copy(z)
        switched[:, C] = z[:, C_switch]
        switched[:, C_switch] = z[:, C]
        H = np.zeros_like(switched)
        H[1:] = switched[:-1]
        ref = ctx.decode_and_process(switched, history=H, sample_method="argmax")

        out, switched_fused = ctx.style_transfer_song(*args, C=C, C_switch=C_switch)
        np.testing.assert_allclose(switched_fused, switched, rtol=1e-5, atol=1e-6)
        for a, b in zip(out, ref):
            np.testing.assert_array_equal(a, b)

    @pytest.mark.slow
    def test_generation_context_on_mesh(self, tiny_setup):
        """Serving over a device mesh: DP (8x1) and DP+TP (4x2) contexts must
        reproduce the single-device encode/transfer outputs (GSPMD partitions
        the same jitted programs; the batch axis shards over 'data')."""
        from midi_vae_tpu.parallel import make_mesh

        cfg, model, params, ds = tiny_setup
        args = (ds.X_train[0], ds.I_train[0], ds.V_train[0], ds.D_train[0])
        ref_ctx = GenerationContext(cfg, model, params)
        z_ref = ref_ctx.encode_song(*args)
        probs_ref = ref_ctx.decode_batch(z_ref)
        out_ref, sw_ref = ref_ctx.style_transfer_song(*args, C=0, C_switch=1)
        for n_model in (1, 2):
            mesh = make_mesh(n_model=n_model)
            ctx = GenerationContext(cfg, model, params, mesh=mesh)
            np.testing.assert_allclose(
                ctx.encode_song(*args), z_ref, rtol=1e-5, atol=1e-5
            )
            # continuous surfaces must agree across shardings (argmax rolls
            # are tie-brittle at random init, where softmax is near-uniform)
            probs = ctx.decode_batch(z_ref)
            assert probs.keys() == probs_ref.keys()
            for k in probs:
                np.testing.assert_allclose(
                    probs[k], probs_ref[k], rtol=1e-5, atol=1e-6
                )
            out, sw = ctx.style_transfer_song(*args, C=0, C_switch=1)
            np.testing.assert_allclose(sw, sw_ref, rtol=1e-5, atol=1e-5)
            for a, b in zip(out, out_ref):
                assert np.asarray(a).shape == np.asarray(b).shape

    def test_sweep_dimension_batched(self, tiny_setup):
        cfg, model, params, ds = tiny_setup
        ctx = GenerationContext(cfg, model, params)
        values = [-1.0, 0.0, 1.0]
        Y, I, V, D = sweep.sweep_dimension(
            ctx, np.zeros((1, cfg.latent_dim), np.float32), values, dim=0
        )
        assert Y.shape == (len(values) * cfg.output_length, cfg.new_num_notes)
        # different values on a dim must change the decoded output... not
        # guaranteed at init, but latents differ so probs should differ:
        outs0 = ctx.decode_batch(np.full((1, cfg.latent_dim), -3.0, np.float32))
        outs1 = ctx.decode_batch(np.full((1, cfg.latent_dim), 3.0, np.float32))
        assert not np.allclose(outs0["notes"], outs1["notes"])


class TestHarness:
    @pytest.mark.slow
    def test_sampling_regions_section(self, tiny_setup, tmp_path):
        """The sampling-region Mahalanobis section end to end through the
        harness (the probe loop itself is differentially gated by
        ref_parity_check --probes): the reference's 11-entry scales/locs
        grids (duplicate trailing 10000.0, vae_evaluation.py:1550/:1602),
        finite curves, artifacts written."""
        from midi_vae_tpu.evaluation import EvalSections, Evaluator

        cfg, model, params, ds = tiny_setup
        out = str(tmp_path / "eval")
        evaluator = Evaluator(cfg, params, ds, out, classifiers=None, seed=0)
        sections = EvalSections(
            evaluate_autoencoding_and_stuff=False,
            mix_with_previous=False,
            switch_styles=False,
            evaluate_different_sampling_regions=True,
        )
        results = evaluator.run(sections, log_fn=lambda s: None)
        for key, grid in (("sampling_region_scales", "scales"),
                          ("sampling_region_locs", "locs")):
            entry = results[key]
            assert len(entry[grid]) == 11  # reference grid incl. duplicate
            assert entry[grid][-1] == entry[grid][-2] == 10000.0
            assert np.all(np.isfinite(entry["means"]))
            assert np.all(np.isfinite(entry["stds"]))
        import os

        assert os.path.exists(os.path.join(out, "aaa_signature_scales.png"))
        assert os.path.exists(os.path.join(out, "aaa_signature_locs.png"))

    @pytest.mark.slow
    def test_full_run_writes_artifacts(self, tiny_setup, tmp_path):
        from midi_vae_tpu.evaluation import EvalSections, Evaluator

        cfg, model, params, ds = tiny_setup
        out = str(tmp_path / "eval")
        evaluator = Evaluator(cfg, params, ds, out, classifiers=None, seed=0)
        sections = EvalSections(
            evaluate_autoencoding_and_stuff=True,
            mix_with_previous=True,
            switch_styles=True,
            max_new_sampled_songs=1,
            max_new_sampled_interpolation_songs=1,
            interpolation_song_length=2,
            max_new_sampled_long_songs=1,
            long_song_length=2,
            chord_evaluation=True,
            pitch_evaluation=True,
            evaluate_different_sampling_regions=False,
        )
        results = evaluator.run(sections, log_fn=lambda s: None)
        import os

        assert os.path.exists(os.path.join(out, "evaluation_metrics.csv"))
        assert os.path.exists(os.path.join(out, "results.json"))
        assert "mean_reconstruction_accuracy" in results
        assert len(results["autoencoding_metrics"]) == 3  # 2 songs + mean row
        # style-switch artifacts per class pair
        midis = [f for f in os.listdir(out) if f.endswith(".mid")]
        assert any("fullswitch" in m for m in midis)
        assert any("autoencoded" in m for m in midis)
        assert any("random_long" in m for m in midis)
        assert "chord_latents" in results and "pitch_latents" in results
        # signature mahalanobis recorded per class pair
        assert any(
            k.startswith("original_") for k in results["signature_mahalanobis"]
        )

    def test_results_json_serializes_non_finite_as_null(self, tmp_path):
        """Sweep stats keep the reference's NaN trend-strength edge in memory
        (PARITY.md quirk #3); results.json must still be standard JSON, so
        non-finite floats become null at dump time only."""
        import json
        import os

        from midi_vae_tpu.evaluation.harness import Evaluator

        ev = Evaluator.__new__(Evaluator)
        ev.save_folder = str(tmp_path)
        ev.results = {
            "nan": float("nan"),
            "inf": np.float64("inf"),
            "nested": [np.float32("nan"), 1.5, {"k": -np.inf}],
            "arr": np.array([np.nan, 2.0]),
            "fine": 3,
        }
        ev._dump_results_json()
        loaded = json.load(open(os.path.join(tmp_path, "results.json")))
        assert loaded["nan"] is None and loaded["inf"] is None
        assert loaded["nested"] == [None, 1.5, {"k": None}]
        assert loaded["arr"] == [None, 2.0]
        assert loaded["fine"] == 3
        # in-memory results untouched
        assert np.isnan(ev.results["nan"])

    def test_latent_sweep_section(self, tiny_setup, tmp_path):
        from midi_vae_tpu.evaluation import EvalSections, Evaluator

        cfg, model, params, ds = tiny_setup
        out = str(tmp_path / "sweep")
        evaluator = Evaluator(cfg, params, ds, out, seed=0)
        sections = EvalSections(
            evaluate_autoencoding_and_stuff=False,
            latent_sweep=True,
            num_latent_sweep_samples=1,
            num_latent_sweep_evaluation_songs=1,
            save_anything=False,
        )
        results = evaluator.run(sections, log_fn=lambda s: None)
        assert "latent_sweep_best_dims" in results
        assert all(
            0 <= d < cfg.latent_dim for d in results["latent_sweep_best_dims"].values()
        )


class TestArgmaxFastPaths:
    """The vectorized argmax paths must equal the per-row sample_vector loop."""

    def test_notes(self):
        cfg = Config()
        rng = np.random.RandomState(0)
        probs = rng.rand(5, 64, 61).astype(np.float32)
        probs[0, 3] = 0  # all-zero row -> pitch 0, like the reference's
        # sample_vector else-branch (vae_definition.py:1065-1066; locked by
        # tools/ref_parity_check.py --sampling)
        fast = sampling.sample_notes_prediction(probs, "argmax", cfg)
        slow = np.zeros_like(fast)
        flat = probs.reshape(-1, 61)
        for i, step in enumerate(flat):
            idx = sampling.sample_vector(step, "argmax")
            if idx == 60:
                continue
            slow[i, idx] = 1
        np.testing.assert_array_equal(fast, slow)
        assert fast[0 * 64 + 3, 0] == 1  # the all-zero row emits pitch 0

    def test_instrument(self):
        cfg = Config()
        rng = np.random.RandomState(1)
        probs = rng.rand(3, 4, 16).astype(np.float32)
        fast = sampling.sample_instrument_prediction(probs, "argmax", cfg)
        for b in range(3):
            for v in range(4):
                assert fast[b, v].argmax() == probs[b, v].argmax()
                assert fast[b, v].sum() == 1

    def test_held(self):
        cfg = Config()
        rng = np.random.RandomState(2)
        probs = rng.rand(3, 64, 2).astype(np.float32)
        fast = sampling.sample_held_notes_prediction(probs, "argmax", cfg)
        assert fast.shape == (192,)
        np.testing.assert_array_equal(
            fast, probs.reshape(-1, 2).argmax(-1).astype(np.float32)
        )


class TestDeviceArgmaxPath:
    def test_matches_probs_path(self, tiny_setup):
        cfg, model, params, ds = tiny_setup
        ctx = GenerationContext(cfg, model, params)
        rngz = np.random.RandomState(0)
        z = rngz.randn(3, cfg.latent_dim).astype(np.float32)
        # probs path (force through process_decoder_outputs)
        outs = ctx.decode_batch(z)
        ref = sampling.process_decoder_outputs(outs, "argmax", cfg)
        got = ctx.decode_and_process(z, sample_method="argmax")
        for a, b, name in zip(got, ref, "YIVDN"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6, err_msg=name
            )


class TestVelocityOverrideVectorized:
    def test_matches_loop(self):
        cfg = Config()
        rng = np.random.RandomState(0)
        for trial in range(5):
            T = 128
            Y = np.zeros((T, 60), np.float32)
            for i in range(T):
                if rng.rand() < 0.7:
                    Y[i, rng.randint(60)] = 1
            V = rng.rand(T)
            got = sampling.override_pitches_from_velocity(Y, V.copy(), cfg)
            ref = sampling._override_pitches_from_velocity_loop(Y, V.copy(), cfg)
            np.testing.assert_allclose(got, ref, err_msg=f"trial {trial}")


class TestStatsModule:
    def test_program_statistics(self):
        from midi_vae_tpu.data.dataset import Dataset
        from midi_vae_tpu.evaluation import stats

        cfg = Config()
        ds = Dataset(cfg=cfg)
        # two songs per class, known programs
        for c, programs in ((0, [0, 0]), (1, [40, 48])):
            for prog in programs:
                import numpy as np

                I = np.zeros((4, 16), np.float32)
                I[0, prog // 8] = 1
                ds.I_train.append(I)
                ds.C_train.append(c)
                ds.X_train.append(np.zeros((2, 64, 61), np.float32))
        s = stats.program_statistics(ds, cfg)
        assert s.programs_for_each_class[0] == [0, 0][:1] or 0 in s.programs_for_each_class[0]
        assert 40 in s.programs_for_each_class[1] and 48 in s.programs_for_each_class[1]
        # probabilities normalized
        for d in s.program_probability_dict_for_each_class:
            if d:
                assert sum(d.values()) <= 1.0 + 1e-9
        sw = stats.switch_percentage_between_classes(s, cfg)
        # voice 0 differs across classes; voices 1-3 are phantom program-0
        # rows on both sides (reference zip semantics) -> 1/4 switched
        assert sw[0, 1] == 0.25

    def test_frankenstein_baselines(self):
        from midi_vae_tpu.evaluation import stats

        cfg = Config()
        rng = np.random.RandomState(0)
        spm = stats.frankenstein_random_pitches(cfg, total_evaluations=5, rng=rng)
        assert spm.shape == (4, 4)
        Y_list = [np.zeros((2, 64, 61), np.float32) for _ in range(4)]
        for Y in Y_list:
            for w in range(2):
                for t in range(0, 64, 4):
                    Y[w, t, rng.randint(60)] = 1
        spm2 = stats.frankenstein_from_songs(Y_list, cfg, total_evaluations=5, rng=rng)
        assert spm2.shape == (4, 4)


class TestProbesModule:
    def test_chord_window_layout(self):
        from midi_vae_tpu.evaluation import probes

        cfg = Config()
        X, I, V, D = probes.chord_window((0, 4, 7), 5, cfg)
        assert X.shape == (1, 64, 61)
        # voices 0..2 carry the triad, voice 3 is silent
        assert X[0, 0, 60 - cfg.low_crop] == 1
        assert X[0, 1, 64 - cfg.low_crop] == 1
        assert X[0, 2, 67 - cfg.low_crop] == 1
        assert X[0, 3, -1] == 1
        assert D[0, 0] == 0 and D[0, 1] == 1

    def test_pitch_to_name(self):
        from midi_vae_tpu.evaluation.probes import pitch_to_name

        assert pitch_to_name(60) == "C5"
        assert pitch_to_name(69) == "A5"

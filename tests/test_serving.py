"""Serving bundles: AOT-exported, weights-baked inference programs.

midi_vae_tpu/serving.py exports encode / decode_argmax / style_transfer
as serialized jax.export artifacts, one program per batch bucket; these
tests pin the bundle format, the loader's bucket selection + pad/trim,
float-equivalence (and argmax identity) with the live model, shape
enforcement, and the tools/export_serving.py CLI end to end.
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from midi_vae_tpu import serving
from midi_vae_tpu.config import Config
from midi_vae_tpu.models.vae import MidiVAE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny(**kw) -> Config:
    base = dict(
        lstm_size=16, latent_dim=24, bars_input_length=2,
        bars_output_length=2, max_voices=2, use_pallas="off",
    )
    base.update(kw)
    return Config(**base)


def make_batch(cfg: Config, B: int, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    X = np.zeros((B, cfg.input_length, cfg.input_dim), np.float32)
    for i in range(B):
        for t in range(cfg.input_length):
            X[i, t, rng.integers(cfg.input_dim)] = 1
    batch = {"X": X}
    if cfg.meta_instrument:
        I = np.zeros((B, cfg.max_voices, cfg.instrument_dim), np.float32)
        I[..., 0] = 1
        batch["I"] = I
    if cfg.meta_velocity:
        batch["V"] = rng.random(
            (B, cfg.meta_velocity_length, 1)
        ).astype(np.float32)
    if cfg.meta_held_notes:
        D = np.zeros((B, cfg.meta_held_notes_length, 2), np.float32)
        D[..., 0] = 1
        batch["D"] = D
    return batch


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    cfg = tiny()
    model = MidiVAE(cfg, platform="cpu")
    params = model.init_params(jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("bundle"))
    manifest = serving.export_serving_bundle(
        cfg, params, out, batch_size=[4, 8]
    )
    return cfg, model, params, out, manifest


class TestServingBundle:
    def test_manifest_and_files(self, bundle):
        cfg, _, _, out, manifest = bundle
        assert manifest["batch_sizes"] == [4, 8]
        assert manifest["deterministic_encode"] is True
        for name in ("encode", "decode_argmax", "style_transfer"):
            for B in (4, 8):
                f = f"{name}@{B}.jaxexport"
                assert os.path.getsize(os.path.join(out, f)) == \
                    manifest["blob_bytes"][f]
        assert Config.load(os.path.join(out, "config.json")) == cfg

    def test_encode_matches_live_model(self, bundle):
        cfg, model, params, out, _ = bundle
        b = serving.load_serving_bundle(out)
        batch = make_batch(cfg, 8)
        z = b.encode(batch)
        z_ref = np.asarray(
            model.encode(jax.device_put(params), batch, None, 0.0)
        )
        np.testing.assert_allclose(z, z_ref, rtol=1e-4, atol=1e-6)

    def test_bucket_pad_and_trim(self, bundle):
        """A 3-row request runs on the 4-bucket and trims back to 3; the
        padded rows must not perturb the real rows' outputs."""
        cfg, model, params, out, _ = bundle
        b = serving.load_serving_bundle(out)
        batch8 = make_batch(cfg, 8)
        batch3 = {k: v[:3] for k, v in batch8.items()}
        assert b.bucket_for(3) == 4
        z3 = b.encode(batch3)
        assert z3.shape == (3, cfg.latent_dim)
        z8 = b.encode(batch8)
        np.testing.assert_allclose(z3, z8[:3], rtol=1e-4, atol=1e-6)
        with pytest.raises(ValueError, match="largest bucket"):
            b.bucket_for(9)

    def test_decode_argmax_matches_live_model(self, bundle):
        cfg, model, params, out, _ = bundle
        b = serving.load_serving_bundle(out)
        z = b.encode(make_batch(cfg, 8))
        outs = b.decode_argmax(z)
        assert {"notes_idx", "inst_idx", "vel"} <= set(outs)
        live = model.decode(
            jax.device_put(params), z, history=np.zeros_like(z),
            inference=True,
        )
        np.testing.assert_array_equal(
            outs["notes_idx"], np.argmax(np.asarray(live["notes"][0]), -1)
        )
        np.testing.assert_allclose(
            outs["vel"], np.asarray(live["velocity"][0])[..., 0],
            rtol=1e-4, atol=1e-6,
        )

    def test_style_transfer_one_program(self, bundle):
        cfg, _, _, out, _ = bundle
        b = serving.load_serving_bundle(out)
        batch = make_batch(cfg, 8)
        perm = np.arange(cfg.latent_dim)[::-1].copy()
        outs, switched = b.style_transfer(batch, perm)
        z = b.encode(batch)
        np.testing.assert_allclose(
            switched, z[:, perm], rtol=1e-4, atol=1e-6
        )
        assert outs["notes_idx"].shape[0] == 8

    def test_trailing_dim_enforcement(self, bundle):
        cfg, _, _, out, _ = bundle
        b = serving.load_serving_bundle(out)
        bad = make_batch(cfg, 4)
        bad["X"] = bad["X"][:, :, :-1]  # wrong pitch dim
        with pytest.raises(ValueError, match="trailing dims"):
            b.encode(bad)

    @pytest.mark.slow
    def test_cli_export(self, tmp_path):
        from midi_vae_tpu.training import VAETrainer
        from midi_vae_tpu.training import checkpoint as ckpt

        cfg = tiny()
        trainer = VAETrainer(cfg)
        state = trainer.init_state(seed=0)
        run = str(tmp_path / "run")
        ckpt.save_checkpoint(
            run, 5, state.params, state.opt_state, state.rng, cfg
        )
        out = str(tmp_path / "bundle")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        res = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "export_serving.py"),
             "--model", run, "--out", out, "--batch", "2", "4", "--cpu"],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
        )
        assert res.returncode == 0, res.stdout + res.stderr
        info = json.loads(res.stdout.strip().splitlines()[-1])
        assert info["batch_sizes"] == [2, 4]
        b = serving.load_serving_bundle(out)
        z = b.encode(make_batch(cfg, 3))
        assert z.shape == (3, cfg.latent_dim)
        assert np.all(np.isfinite(z))


class TestBundleValidationAndSongAPI:
    def test_platform_mismatch_clean_error(self, bundle, tmp_path):
        """A bundle exported for another platform must fail at LOAD time
        with an actionable message, not at call time with an XLA error."""
        import shutil

        _, _, _, out, _ = bundle
        alien = str(tmp_path / "alien")
        shutil.copytree(out, alien)
        mpath = os.path.join(alien, "manifest.json")
        with open(mpath) as f:
            m = json.load(f)
        m["platforms"] = ["tpu"]
        with open(mpath, "w") as f:
            json.dump(m, f)
        with pytest.raises(RuntimeError, match="exported for platform"):
            serving.load_serving_bundle(alien)

    def test_future_format_clean_error(self, bundle, tmp_path):
        import shutil

        _, _, _, out, _ = bundle
        future = str(tmp_path / "future")
        shutil.copytree(out, future)
        mpath = os.path.join(future, "manifest.json")
        with open(mpath) as f:
            m = json.load(f)
        m["bundle_format"] = serving.BUNDLE_FORMAT + 1
        with open(mpath, "w") as f:
            json.dump(m, f)
        with pytest.raises(RuntimeError, match="newer than this framework"):
            serving.load_serving_bundle(future)

    def test_style_transfer_song_matches_live_context(self, bundle):
        """The sealed song-level transfer must make the SAME argmax
        decisions as the live GenerationContext (the CLI drives both
        through one surface)."""
        from midi_vae_tpu.evaluation.generation import GenerationContext

        cfg, model, params, out, _ = bundle
        b = serving.load_serving_bundle(out)
        ctx = GenerationContext(cfg, model, params)
        rng = np.random.default_rng(3)
        n = 3
        X = np.zeros((n, cfg.input_length, cfg.input_dim), np.float32)
        for i in range(n):
            for t in range(cfg.input_length):
                X[i, t, rng.integers(cfg.input_dim)] = 1
        I = np.zeros((cfg.max_voices, cfg.instrument_dim), np.float32)
        I[:, 0] = 1
        V = rng.random((n, cfg.output_length)).astype(np.float32)
        D = np.zeros((n, cfg.output_length), np.float32)

        (Yb, Ib, Vb, Db, Nb), sw_b = b.style_transfer_song(
            X, I, V, D, C=0, C_switch=1
        )
        (Yl, Il, Vl, Dl, Nl), sw_l = ctx.style_transfer_song(
            X, I, V, D, C=0, C_switch=1
        )
        np.testing.assert_array_equal(Yb, Yl)
        if Ib is not None:
            np.testing.assert_array_equal(Ib, Il)
        if Vb is not None:
            np.testing.assert_allclose(Vb, Vl, atol=1e-5)
        np.testing.assert_allclose(sw_b, sw_l, atol=1e-5)

    def test_encode_and_decode_song_roundtrip(self, bundle):
        cfg, model, params, out, _ = bundle
        b = serving.load_serving_bundle(out)
        rng = np.random.default_rng(5)
        n = 2
        X = np.zeros((n, cfg.input_length, cfg.input_dim), np.float32)
        for i in range(n):
            for t in range(cfg.input_length):
                X[i, t, rng.integers(cfg.input_dim)] = 1
        I = np.zeros((cfg.max_voices, cfg.instrument_dim), np.float32)
        I[:, 0] = 1
        V = rng.random((n, cfg.output_length)).astype(np.float32)
        D = np.zeros((n, cfg.output_length), np.float32)
        z = b.encode_song(X, I, V, D)
        assert z.shape == (n, cfg.latent_dim)
        rolls = b.decode_and_process(z, history=z)
        assert rolls[0].shape[0] == n * cfg.output_length
        with pytest.raises(ValueError, match="argmax"):
            b.decode_and_process(z, sample_method="choice")

    def test_long_song_composed_transfer_matches_live(self, bundle):
        """A song longer than the largest bucket takes the composed
        encode -> host roll -> chunked decode path; argmax decisions must
        still match the live context."""
        from midi_vae_tpu.evaluation.generation import GenerationContext

        cfg, model, params, out, _ = bundle
        b = serving.load_serving_bundle(out)
        ctx = GenerationContext(cfg, model, params)
        rng = np.random.default_rng(11)
        n = b.max_batch + 5
        X = np.zeros((n, cfg.input_length, cfg.input_dim), np.float32)
        for i in range(n):
            for t in range(cfg.input_length):
                X[i, t, rng.integers(cfg.input_dim)] = 1
        I = np.zeros((cfg.max_voices, cfg.instrument_dim), np.float32)
        I[:, 0] = 1
        V = rng.random((n, cfg.output_length)).astype(np.float32)
        D = np.zeros((n, cfg.output_length), np.float32)
        (Yb, *_), sw_b = b.style_transfer_song(X, I, V, D, C=0, C_switch=1)
        (Yl, *_), sw_l = ctx.style_transfer_song(X, I, V, D, C=0, C_switch=1)
        np.testing.assert_array_equal(Yb, Yl)
        np.testing.assert_allclose(sw_b, sw_l, atol=1e-5)


@pytest.mark.slow
class TestSealedJudges:
    """Sealed classifier judges (serving.export_classifier_judges): the
    three style judges of vae_evaluation.py:75-117 exported into the
    bundle as weights-baked programs, so transfer-and-judge runs from
    sealed artifacts alone (no checkpoint restore, no model builds)."""

    @pytest.fixture(scope="class")
    def judged_bundle(self, bundle):
        from midi_vae_tpu.models.classifier import (
            ClassifierSpec,
            StyleClassifier,
        )

        cfg, model, params, out, _ = bundle
        classifiers = {}
        for i, kind in enumerate(("pitch", "velocity", "instrument")):
            spec = ClassifierSpec.for_kind(
                kind, cfg, lstm_size=8, num_layers=1
            )
            m = StyleClassifier(spec, platform="cpu")
            classifiers[kind] = (m, m.init_params(jax.random.PRNGKey(90 + i)))
        manifest = serving.export_classifier_judges(
            classifiers, out, batch_size=[4, 8]
        )
        return cfg, classifiers, out, manifest

    def _judge_inputs(self, cfg, n=5, seed=0):
        rng = np.random.default_rng(seed)
        return {
            "pitch": rng.random(
                (n, cfg.output_length, cfg.input_dim)
            ).astype(np.float32),
            "velocity": rng.random(
                (n, cfg.output_length, 1)
            ).astype(np.float32),
            "instrument": rng.random(
                (n, cfg.max_voices, cfg.instrument_dim)
            ).astype(np.float32),
        }

    def test_manifest_and_loader(self, judged_bundle):
        cfg, classifiers, out, manifest = judged_bundle
        assert set(manifest["judges"]) == {"pitch", "velocity", "instrument"}
        for kind in manifest["judges"]:
            for B in (4, 8):
                assert os.path.exists(
                    os.path.join(out, f"judge_{kind}@{B}.jaxexport")
                )
        b = serving.load_serving_bundle(out)
        assert set(b.judges) == {"pitch", "velocity", "instrument"}

    def test_sealed_judges_match_live(self, judged_bundle):
        """Each sealed judge must be float-equivalent to make_judge on the
        live model, with identical argmax class decisions; the ensemble
        must match models.classifier.ensemble_prediction."""
        from midi_vae_tpu.models.classifier import (
            ensemble_prediction,
            make_judge,
        )

        cfg, classifiers, out, _ = judged_bundle
        b = serving.load_serving_bundle(out)
        judges = b.judges
        xs = self._judge_inputs(cfg)
        live_probs = {}
        for kind, (m, p) in classifiers.items():
            live = np.asarray(make_judge(m, p)(xs[kind]))
            sealed = judges[kind](xs[kind])
            live_probs[kind] = live
            np.testing.assert_allclose(
                sealed, live, rtol=2e-5, atol=1e-6, err_msg=kind
            )
            assert np.array_equal(
                np.argmax(sealed, axis=1), np.argmax(live, axis=1)
            ), kind
        ens = b.ensemble_prediction(
            xs["pitch"], xs["instrument"], xs["velocity"]
        )
        live_ens = np.asarray(ensemble_prediction(
            live_probs["pitch"], live_probs["instrument"],
            live_probs["velocity"],
        ))
        np.testing.assert_allclose(ens, live_ens, rtol=2e-5, atol=1e-6)

    def test_chunking_and_preprocess(self, judged_bundle):
        """Rows beyond the top bucket chunk transparently; the velocity
        spec's host-side preprocessing is replayed from the manifest."""
        cfg, classifiers, out, _ = judged_bundle
        b = serving.load_serving_bundle(out)
        xs = self._judge_inputs(cfg, n=19, seed=3)  # > top bucket 8
        from midi_vae_tpu.models.classifier import make_judge

        for kind, (m, p) in classifiers.items():
            sealed = b.judges[kind](xs[kind])
            live = np.asarray(make_judge(m, p)(xs[kind]))
            assert sealed.shape == (19, cfg.num_classes)
            np.testing.assert_allclose(
                sealed, live, rtol=2e-5, atol=1e-6, err_msg=kind
            )

    def test_full_sealed_transfer_and_judge(self, judged_bundle):
        """The complete pipeline from sealed artifacts alone: windows ->
        style_transfer_song -> judge the transferred output with the
        sealed judges -- no live model objects anywhere."""
        from midi_vae_tpu.evaluation.generation import (
            split_song_back_to_samples,
        )
        from midi_vae_tpu.evaluation.sampling import add_silent_column

        cfg, _, out, _ = judged_bundle
        b = serving.load_serving_bundle(out)
        rng = np.random.default_rng(5)
        n = 4
        X = np.zeros((n, cfg.input_length, cfg.input_dim), np.float32)
        for i in range(n):
            for t in range(cfg.input_length):
                X[i, t, rng.integers(cfg.input_dim)] = 1
        I = np.zeros((cfg.max_voices, cfg.instrument_dim), np.float32)
        I[:, 0] = 1
        V = rng.random((n, cfg.output_length)).astype(np.float32)
        D = np.zeros((n, cfg.output_length), np.float32)
        (Y, I_pred, V_pred, D_pred, _), switched = b.style_transfer_song(
            X, I, V, D, C=0, C_switch=1
        )
        windows = split_song_back_to_samples(Y, cfg.output_length)
        pitch_x = np.stack([add_silent_column(w, cfg) for w in windows])
        probs = b.judges["pitch"](pitch_x)
        assert probs.shape == (n, cfg.num_classes)
        assert np.all(np.isfinite(probs))
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)

    def test_bundle_without_judges_is_empty(self, bundle, tmp_path):
        cfg, model, params, _, _ = bundle
        out = str(tmp_path / "nojudges")
        serving.export_serving_bundle(cfg, params, out, batch_size=[4])
        b = serving.load_serving_bundle(out)
        assert b.judges == {}
        with pytest.raises(RuntimeError, match="sealed judges"):
            b.ensemble_prediction(None, None, None)

    def test_export_platform_routing_rule(self):
        """Pallas kernels only lower for TPU: any non-tpu lowering target
        must force the jnp graphs (regression for the cross-platform
        export crash: a TPU-backend process exporting --platforms cpu
        dispatched real kernels into the CPU lowering)."""
        from midi_vae_tpu.serving import _export_platform

        assert _export_platform(None) is None
        assert _export_platform([]) is None
        assert _export_platform(["tpu"]) == "tpu"
        assert _export_platform(["cpu"]) == "cpu"
        assert _export_platform(["tpu", "cpu"]) == "cpu"

    def test_judges_export_retargets_model_platform(self, bundle, tmp_path):
        """Sealing a judge for --platforms cpu from a live classifier that
        was built for TPU compute must rebuild the graph at the lowering
        platform: the TPU-built model dispatches real Pallas kernels,
        which cannot lower for CPU (the pre-fix crash, reproducible on
        the CPU suite because StyleClassifier keys Pallas off its
        platform argument alone)."""
        from midi_vae_tpu.models.classifier import (
            ClassifierSpec,
            StyleClassifier,
            make_judge,
        )

        cfg, _, params, _, _ = bundle
        out = str(tmp_path / "retarget")
        serving.export_serving_bundle(
            cfg, params, out, batch_size=[4], platforms=["cpu"]
        )
        spec = ClassifierSpec.for_kind("pitch", cfg, lstm_size=8, num_layers=1)
        live_tpu = StyleClassifier(spec, platform="tpu")
        p = live_tpu.init_params(jax.random.PRNGKey(3))
        serving.export_classifier_judges(
            {"pitch": (live_tpu, p)}, out, batch_size=[4], platforms=["cpu"]
        )
        b = serving.load_serving_bundle(out)
        x = np.random.default_rng(0).random(
            (3, cfg.output_length, cfg.input_dim)
        ).astype(np.float32)
        probs = b.judges["pitch"](x)
        ref = np.asarray(
            make_judge(StyleClassifier(spec, platform="cpu"), p)(x)
        )
        np.testing.assert_allclose(probs, ref, atol=1e-5)

    def test_zero_row_judge_matches_make_judge_surface(self, judged_bundle):
        """Empty input -> (0, k) result, same as the live make_judge
        surface (a song that produced no windows must not crash)."""
        from midi_vae_tpu.models.classifier import make_judge

        cfg, classifiers, out, _ = judged_bundle
        b = serving.load_serving_bundle(out)
        empty = np.zeros((0, cfg.output_length, cfg.input_dim), np.float32)
        probs = b.judges["pitch"](empty)
        live = np.asarray(make_judge(*classifiers["pitch"])(empty))
        assert probs.shape == live.shape == (0, cfg.num_classes)
        assert probs.dtype == live.dtype

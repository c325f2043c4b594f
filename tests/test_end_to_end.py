"""End-to-end CLI integration: corpus -> train.py -> classify.py ->
evaluate.py, all through subprocesses like a user would run them."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMALL = [
    "--set", "lstm_size=32", "--set", "latent_dim=32", "--set", "batch_size=16",
]


def run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert result.returncode == 0, (
        f"command failed: {args}\nstdout: {result.stdout[-3000:]}"
        f"\nstderr: {result.stderr[-3000:]}"
    )
    return result.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    run(
        [os.path.join(REPO, "tools/make_demo_corpus.py"),
         str(d / "corpus"), "--songs-per-style", "4"],
        cwd=str(d),
    )
    return d


@pytest.fixture(scope="module")
def workdir3(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e3")
    run(
        [os.path.join(REPO, "tools/make_demo_corpus.py"),
         str(d / "corpus"), "--songs-per-style", "4", "--styles", "3"],
        cwd=str(d),
    )
    return d


@pytest.mark.slow
def test_train_on_pathological_corpus(tmp_path):
    """Robustness soak: the full CLI pipeline on a randomized fuzz corpus
    (multi-tempo files, off-grid starts, dense chords, sub-quantum notes,
    drums, out-of-crop pitches) must import cleanly, train with finite
    losses, and evaluate without crashing."""
    from conftest import tools_module

    write_fuzz_corpus = tools_module("ref_parity_check").write_fuzz_corpus
    corpus = tmp_path / "corpus"
    write_fuzz_corpus(str(corpus / "style1"), 6, 31)
    write_fuzz_corpus(str(corpus / "style2"), 6, 32)

    out = run(
        [os.path.join(REPO, "train.py"), "--source", str(corpus),
         "--output", str(tmp_path / "vae"), "--cache", str(tmp_path / "cache"),
         "--classes", "style1,style2", "--epochs", "3", "--cpu", *SMALL,
         "--set", "test_step=1"],
        cwd=str(tmp_path),
    )
    # the pipelined device loop logs one line per dispatch chunk, labeled
    # with the chunk's final epoch -- the last epoch is always logged
    assert "epoch 2:" in out
    hist = json.load(open(tmp_path / "vae" / "history.json"))
    assert hist["epoch"] == [0, 1, 2]
    losses = [m["loss"] for m in hist["train"]]
    import math
    assert losses and all(math.isfinite(v) for v in losses), losses

    run(
        [os.path.join(REPO, "evaluate.py"), "--source", str(corpus),
         "--model", str(tmp_path / "vae"), "--output", str(tmp_path / "eval"),
         "--cache", str(tmp_path / "cache"), "--cpu",
         "--sections", "autoencoding", "--num-songs", "1"],
        cwd=str(tmp_path),
    )
    assert os.path.exists(tmp_path / "eval" / "evaluation_metrics.csv")


@pytest.mark.slow
def test_three_class_switch_matrix(workdir3):
    """>= 3 classes: per-(C -> C_switch) columns must all survive -- the
    reference overwrites its switched_* CSV columns per C_switch
    (vae_evaluation.py:2552-2604), lossy for 3+ classes; we record each
    pair."""
    d = workdir3
    classes = "style1,style2,style3"
    run(
        [os.path.join(REPO, "train.py"), "--source", str(d / "corpus"),
         "--output", str(d / "vae"), "--cache", str(d / "cache"),
         "--classes", classes,
         "--epochs", "2", "--cpu", "--set", "save_step=1"] + SMALL,
        cwd=str(d),
    )
    run(
        [os.path.join(REPO, "classify.py"), "--source", str(d / "corpus"),
         "--output", str(d / "clf"), "--cache", str(d / "cache"),
         "--classes", classes,
         "--epochs", "1", "--cpu", "--lstm-size", "24",
         "--batch-size", "16", "--kinds", "pitch,velocity,instrument"],
        cwd=str(d),
    )
    run(
        [os.path.join(REPO, "evaluate.py"), "--source", str(d / "corpus"),
         "--model", str(d / "vae"), "--classifiers", str(d / "clf"),
         "--output", str(d / "eval"), "--cache", str(d / "cache"),
         "--cpu", "--sections", "autoencoding", "--num-songs", "3"],
        cwd=str(d),
    )
    results = json.load(open(d / "eval" / "results.json"))
    rows = results["autoencoding_metrics"]
    song_rows = [r for r in rows if r.get("song_name") != "Mean"]
    class_index = {"style1": 0, "style2": 1, "style3": 2}
    pair_cols_seen = set()
    for r in song_rows:
        C = class_index[r["class"]]
        targets = [t for t in range(3) if t != C]
        for t in targets:
            key = f"switched_ensemble_classifier_accuracy_{C}to{t}"
            assert key in r, (C, t, sorted(r))
            pair_cols_seen.add(key)
        # the aggregate is the mean of this song's pair values
        pair_vals = [
            r[f"switched_ensemble_classifier_accuracy_{C}to{t}"]
            for t in targets
        ]
        assert r["switched_ensemble_classifier_accuracy"] == pytest.approx(
            sum(pair_vals) / len(pair_vals)
        )
    # both switch targets appear for at least one class
    assert len(pair_cols_seen) >= 2
    # mean row averages each pair column over the rows that contain it
    mean = next(r for r in rows if r.get("song_name") == "Mean")
    for key in pair_cols_seen:
        contributors = [r[key] for r in song_rows if key in r]
        assert mean[key] == pytest.approx(
            sum(contributors) / len(contributors)
        )


@pytest.mark.slow
def test_transfer_cli(workdir):
    """transfer.py: MIDI file in -> style-swapped MIDI out, through the
    one-program serving path (plus the --write-reconstruction companion)."""
    d = workdir
    run(
        [os.path.join(REPO, "train.py"), "--source", str(d / "corpus"),
         "--output", str(d / "vae_t"), "--cache", str(d / "cache"),
         "--epochs", "2", "--cpu"] + SMALL,
        cwd=str(d),
    )
    src = next(
        str(d / "corpus" / "style1" / f)
        for f in sorted(os.listdir(d / "corpus" / "style1"))
    )
    run(
        [os.path.join(REPO, "classify.py"), "--source", str(d / "corpus"),
         "--output", str(d / "clf_t"), "--cache", str(d / "cache"),
         "--epochs", "2", "--cpu", "--lstm-size", "24", "--batch-size", "16",
         "--kinds", "pitch"],
        cwd=str(d),
    )
    out = run(
        [os.path.join(REPO, "transfer.py"), "--model", str(d / "vae_t"),
         "--input", src, "--to-class", "style2",
         "--output", str(d / "transfer"), "--write-reconstruction",
         "--classifiers", str(d / "clf_t"), "--cpu"],
        cwd=str(d),
    )
    assert "style1_to_style2" in out
    assert "judge confidence in style2 (transferred): pitch" in out
    midis = sorted(os.listdir(d / "transfer"))
    assert any(m.endswith("_style1_to_style2.mid") for m in midis)
    assert any(m.endswith("_reconstruction.mid") for m in midis)
    # the source class came from the path substring rule; also check the
    # explicit flags and the same-class guard
    out = run(
        [os.path.join(REPO, "transfer.py"), "--model", str(d / "vae_t"),
         "--input", src, "--from-class", "style2", "--to-class", "style2",
         "--output", str(d / "transfer"), "--cpu"],
        cwd=str(d),
    )
    assert "source class equals target class" in out

    # sealed-artifact path: export a serving bundle from the run, then
    # transfer with ONLY the bundle (no checkpoint restore, no model build)
    run(
        [os.path.join(REPO, "tools", "export_serving.py"),
         "--model", str(d / "vae_t"), "--out", str(d / "bundle_t"),
         "--batch", "8", "--cpu"],
        cwd=str(d),
    )
    out = run(
        [os.path.join(REPO, "transfer.py"), "--bundle", str(d / "bundle_t"),
         "--input", src, "--to-class", "style2",
         "--output", str(d / "transfer_bundle"), "--cpu"],
        cwd=str(d),
    )
    assert "style1_to_style2" in out
    midis = sorted(os.listdir(d / "transfer_bundle"))
    assert any(m.endswith("_style1_to_style2.mid") for m in midis)
    # exactly one of --model/--bundle
    import subprocess as sp

    r = sp.run(
        [sys.executable,
         os.path.join(REPO, "transfer.py"), "--model", str(d / "vae_t"),
         "--bundle", str(d / "bundle_t"), "--input", src,
         "--to-class", "style2", "--output", str(d / "x"), "--cpu"],
        capture_output=True, text=True, cwd=str(d),
    )
    assert r.returncode != 0
    assert "exactly one of --model or --bundle" in r.stderr


@pytest.mark.slow
def test_train_classify_evaluate(workdir):
    d = workdir
    out = run(
        [os.path.join(REPO, "train.py"), "--source", str(d / "corpus"),
         "--output", str(d / "vae"), "--cache", str(d / "cache"),
         "--epochs", "2", "--cpu", "--set", "save_step=1"] + SMALL,
        cwd=str(d),
    )
    assert "epoch 1:" in out
    assert os.path.exists(d / "vae" / "config.json")
    assert os.path.exists(d / "vae" / "history.json")

    out = run(
        [os.path.join(REPO, "classify.py"), "--source", str(d / "corpus"),
         "--output", str(d / "clf"), "--cache", str(d / "cache"),
         "--epochs", "2", "--cpu", "--lstm-size", "24",
         "--batch-size", "16", "--kinds", "pitch,velocity,instrument"],
        cwd=str(d),
    )
    for kind in ("pitch", "velocity", "instrument"):
        assert os.path.exists(d / "clf" / kind / "spec.json")

    out = run(
        [os.path.join(REPO, "evaluate.py"), "--source", str(d / "corpus"),
         "--model", str(d / "vae"), "--classifiers", str(d / "clf"),
         "--output", str(d / "eval"), "--cache", str(d / "cache"),
         "--cpu", "--sections", "autoencoding,random_songs", "--num-songs", "1"],
        cwd=str(d),
    )
    assert "mean pitch reconstruction accuracy" in out
    assert os.path.exists(d / "eval" / "evaluation_metrics.csv")
    results = json.load(open(d / "eval" / "results.json"))
    rows = results["autoencoding_metrics"]
    # per-song rows + mean; judged columns present because classifiers loaded
    assert any("original_pitch_classifier_accuracy" in r for r in rows)
    midis = [f for f in os.listdir(d / "eval") if f.endswith(".mid")]
    assert any("fullswitch" in m for m in midis)

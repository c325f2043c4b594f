"""utils/plotting.py: every figure function renders a nonempty PNG.

These are the SURVEY L2 plotting components (data_class.py:260-350, the
vae_training.py:359-567 loss grid, pitch_classifier.py:166-179 confusion
plot). The harness call sites wrap plotting in ``_plot_safely`` -- which
deliberately swallows exceptions so a degenerate matrix cannot kill an
evaluation run -- so WITHOUT direct tests a plotting regression would
silently degrade every artifact to a "plot failed" log line. Each test
asserts the PNG exists, is nonempty, and starts with the PNG magic.
"""

import numpy as np

from midi_vae_tpu.utils import plotting

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _assert_png(path):
    with open(path, "rb") as f:
        head = f.read(8)
    assert head == PNG_MAGIC, f"{path} is not a PNG"


def _roll(seed, steps=32, pitches=20):
    rng = np.random.default_rng(seed)
    return (rng.random((steps, pitches)) < 0.15).astype(np.float64)


class TestPianorollPlots:
    def test_draw_pianoroll(self, tmp_path):
        p = str(tmp_path / "roll.png")
        plotting.draw_pianoroll(_roll(0), name="test", save_path=p)
        _assert_png(p)

    def test_draw_pianoroll_all_silent(self, tmp_path):
        # np.max == 0: the vmax fallback must keep pcolor happy
        p = str(tmp_path / "silent.png")
        plotting.draw_pianoroll(np.zeros((16, 8)), save_path=p)
        _assert_png(p)

    def test_draw_difference(self, tmp_path):
        p = str(tmp_path / "diff.png")
        plotting.draw_difference_pianoroll(
            _roll(1), _roll(2), name_1="a", name_2="b", save_path=p
        )
        _assert_png(p)

    def test_draw_difference_shape_mismatch_is_a_noop(self, tmp_path, capsys):
        p = str(tmp_path / "nope.png")
        plotting.draw_difference_pianoroll(
            _roll(1), _roll(2, steps=8), save_path=p
        )
        assert "Shape mismatch" in capsys.readouterr().out
        assert not (tmp_path / "nope.png").exists()

    def test_draw_mixture(self, tmp_path):
        p = str(tmp_path / "mix.png")
        plotting.draw_mixture_pianoroll(
            _roll(3), _roll(4), _roll(5), save_path=p
        )
        _assert_png(p)


class TestTrainingAndClassifierPlots:
    def test_plot_training_history(self, tmp_path):
        history = {
            "epoch": [0, 1, 2],
            "train": [
                {"loss": 4.5, "notes_loss": 3.0, "notes_acc": 0.1,
                 "kl_loss": 0.01, "composer_loss": 0.7,
                 "meta_velocity_loss": 0.2},
                {"loss": 4.0, "notes_loss": 2.5, "notes_acc": 0.3,
                 "kl_loss": 0.02, "composer_loss": 0.6,
                 "meta_velocity_loss": 0.15},
                {"loss": 3.5, "notes_loss": 2.0, "notes_acc": 0.5,
                 "kl_loss": 0.03, "composer_loss": 0.5,
                 "meta_velocity_loss": 0.1},
            ],
            "test": [{"epoch": 1, "loss": 4.2, "notes_acc": 0.25}],
        }
        p = str(tmp_path / "hist.png")
        plotting.plot_training_history(history, p)
        _assert_png(p)

    def test_plot_training_history_missing_heads(self, tmp_path):
        # a config without velocity/composer heads records no such keys;
        # the grid must still render the panels it has data for
        history = {
            "epoch": [0, 1],
            "train": [{"loss": 2.0, "notes_acc": 0.4},
                      {"loss": 1.5, "notes_acc": 0.6}],
            "test": [],
        }
        p = str(tmp_path / "sparse.png")
        plotting.plot_training_history(history, p)
        _assert_png(p)

    def test_plot_confusion_matrix(self, tmp_path):
        confusion = np.array([[8.0, 2.0], [1.0, 9.0]])
        p = str(tmp_path / "conf.png")
        plotting.plot_confusion_matrix(confusion, ["a", "b"], 0.85, p)
        _assert_png(p)

    def test_plot_confusion_matrix_empty_row(self, tmp_path):
        # a class with zero true samples: the masked division must leave
        # zeros, not uninitialized memory (the out= comment in the impl)
        confusion = np.array([[5.0, 5.0], [0.0, 0.0]])
        p = str(tmp_path / "conf0.png")
        plotting.plot_confusion_matrix(confusion, ["a", "b"], 0.5, p)
        _assert_png(p)

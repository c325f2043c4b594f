"""Classifier tests: the three input kinds, training convergence on separable
synthetic styles, confusion matrices, ensemble judge, save/load."""

import numpy as np
import jax
import pytest

from midi_vae_tpu.config import small_test_config
from midi_vae_tpu.models.classifier import (
    ClassifierSpec,
    StyleClassifier,
    ensemble_prediction,
)
from midi_vae_tpu.training.classifier_trainer import (
    ClassifierTrainer,
    classifier_arrays,
    load_classifier,
)
from midi_vae_tpu.utils.synthetic import synthetic_flat


def separable_data(n=64, T=8, D=6, num_classes=2, seed=0):
    """Class c concentrates probability mass on feature c."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, n)
    x = np.zeros((n, T, D), np.float32)
    for i, c in enumerate(labels):
        idx = np.clip(rng.poisson(c * 3, size=T), 0, D - 1)
        x[i, np.arange(T), idx] = 1
    return x, labels


class TestClassifier:
    def spec(self, **kw):
        base = dict(
            kind="pitch", input_dim=6, num_classes=2, lstm_size=24,
            num_layers=2, batch_size=16, learning_rate=3e-3,
        )
        base.update(kw)
        return ClassifierSpec(**base)

    def test_kinds_select_arrays(self):
        cfg = small_test_config()
        flat = synthetic_flat(cfg, n_songs=4, windows_per_song=3)
        x, c = classifier_arrays(flat, "pitch")
        assert x.shape == flat.X.shape and len(c) == flat.num_windows
        x, c = classifier_arrays(flat, "velocity")
        assert x.shape == flat.V.shape
        x, c = classifier_arrays(flat, "instrument")
        assert x.shape == (4, cfg.max_voices, cfg.instrument_dim)  # one per song
        assert len(c) == 4

    def test_spec_for_kind(self):
        cfg = small_test_config()
        assert ClassifierSpec.for_kind("pitch", cfg).input_dim == cfg.input_dim
        assert ClassifierSpec.for_kind("velocity", cfg).input_dim == 1
        assert ClassifierSpec.for_kind("instrument", cfg).input_dim == cfg.instrument_dim
        with pytest.raises(ValueError):
            ClassifierSpec.for_kind("tempo", cfg)

    def test_trains_to_high_accuracy(self):
        spec = self.spec()
        trainer = ClassifierTrainer(spec)
        state = trainer.init_state()
        x, c = separable_data()
        for _ in range(30):
            m = trainer.run_epoch(state, x, c)
        assert m["acc"] > 0.9, m
        ev = trainer.evaluate(state, x, c)
        assert ev["accuracy"] > 0.9
        assert ev["confusion"].shape == (2, 2)
        assert ev["confusion"].sum() == len(x)

    def test_save_load_roundtrip(self, tmp_path):
        spec = self.spec()
        trainer = ClassifierTrainer(spec)
        state = trainer.init_state()
        x, c = separable_data(n=16)
        trainer.run_epoch(state, x, c)
        state.epoch = 1
        out = str(tmp_path / "clf")
        trainer.save(out, state)
        model, params = load_classifier(out)
        p1 = np.asarray(trainer.predict(state.params, x[:4]))
        p2 = np.asarray(jax.jit(model.predict)(params, x[:4]))
        np.testing.assert_allclose(p1, p2, rtol=1e-6)

    def test_ensemble_weights(self):
        p = np.array([[0.8, 0.2]])
        i = np.array([[0.6, 0.4]])
        v = np.array([[0.1, 0.9]])
        ens = np.asarray(ensemble_prediction(p, i, v))
        np.testing.assert_allclose(ens, (p + i + v) / 3, rtol=1e-6)  # equal weights
        ens2 = np.asarray(ensemble_prediction(p, i, v, weights=(1.0, 0.0, 0.0)))
        np.testing.assert_allclose(ens2, p, rtol=1e-6)
        np.testing.assert_allclose(ens.sum(-1), 1.0, rtol=1e-6)

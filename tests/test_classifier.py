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

    @pytest.mark.slow
    def test_chunked_device_epochs_match_host_loop(self):
        """run_epochs_device (E epochs, one jitted call) must match E
        sequential host-batched run_epoch calls when the shuffle is off."""
        import jax.numpy as jnp

        spec = self.spec()
        x, c = separable_data(n=40)
        onehot = np.eye(2, dtype=np.float32)[c]

        t_host = ClassifierTrainer(spec)
        s_host = t_host.init_state()
        host_metrics = [
            t_host.run_epoch(s_host, x, c, shuffle=False) for _ in range(3)
        ]

        t_dev = ClassifierTrainer(spec)
        s_dev = t_dev.init_state()
        data = {"x": jnp.asarray(x), "c": jnp.asarray(onehot)}
        dev_metrics = t_dev.run_epochs_device(
            s_dev, data, len(x), 3, shuffle=False
        )
        for e in range(3):
            for k in host_metrics[e]:
                np.testing.assert_allclose(
                    dev_metrics[e][k], host_metrics[e][k], rtol=1e-4,
                    err_msg=f"epoch {e} {k}",
                )
        a = jax.tree_util.tree_leaves(s_host.params)
        b = jax.tree_util.tree_leaves(s_dev.params)
        for p, q in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(p), np.asarray(q), rtol=1e-4, atol=1e-6
            )

    @pytest.mark.slow
    def test_fit_chunked_cadence(self, tmp_path):
        spec = self.spec()
        trainer = ClassifierTrainer(spec)
        state = trainer.init_state()
        x, c = separable_data(n=40)
        history = trainer.fit(
            state, x, c, x, c, epochs=7, test_step=3, save_step=6,
            output_dir=str(tmp_path / "clf"), log_fn=lambda s: None,
        )
        assert history["epoch"] == list(range(7))
        assert [t["epoch"] for t in history["test"]] == [0, 3, 6]
        assert history["test"][-1]["accuracy"] >= 0.4  # it ran for real

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

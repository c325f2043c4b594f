"""Classifier training: jitted global-batch steps + confusion-matrix eval.

Replaces the per-song Keras fit loops of the three classifier scripts
(/root/reference/pitch_classifier.py:198-257 and the velocity/instrument
isomorphs) with the same global-batch pjit design as the VAE trainer.
Evaluation mirrors the reference ``test()``: per-window (per-song for the
instrument kind) predictions accumulated into a confusion matrix with
accuracy = trace/sum (pitch_classifier.py:116-149).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any

import jax
import numpy as np
import optax


from ..data.batching import FlatSplit
from ..models.classifier import ClassifierSpec, StyleClassifier, classifier_loss
from ..parallel import mesh as pmesh
from . import checkpoint as ckpt
from .trainer import padded_batch_order


def classifier_arrays(flat: FlatSplit, kind: str) -> tuple[np.ndarray, np.ndarray]:
    """(inputs, labels) for one classifier kind from a FlatSplit.

    'instrument' keeps one sample per song (instrument_classifier.py:231-237).
    """
    if kind == "pitch":
        return flat.X, flat.labels
    if kind == "velocity":
        return flat.V, flat.labels
    if kind == "instrument":
        first = flat.first_in_song
        return flat.I[first], flat.labels[first]
    raise ValueError(f"unknown classifier kind {kind!r}")


@dataclass
class ClassifierState:
    params: Any
    opt_state: Any
    rng: jax.Array
    epoch: int = 0


class ClassifierTrainer:
    def __init__(self, spec: ClassifierSpec, mesh=None):
        self.spec = spec
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        # Pallas enablement keys off the mesh's actual device platform
        # (see VAETrainer.__init__ / MidiVAE.__init__)
        self.model = StyleClassifier(
            spec, platform=self.mesh.devices.flat[0].platform
        )
        self.optimizer = optax.adam(spec.learning_rate)

        model = self.model
        optimizer = self.optimizer

        def train_step(params, opt_state, x, c, mask):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: classifier_loss(model, p, x, c, mask), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        def eval_step(params, x, c, mask):
            _, metrics = classifier_loss(model, params, x, c, mask)
            probs = model.predict(params, x)
            return metrics, probs

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self.eval_step = jax.jit(eval_step)
        self.predict = jax.jit(model.predict)

    def init_state(self, seed: int = 0) -> ClassifierState:
        key = jax.random.PRNGKey(seed)
        init_key, rng = jax.random.split(key)
        params = self.model.init_params(init_key)
        params = pmesh.shard_params(params, self.mesh)
        opt_state = pmesh.jit_optimizer_init(self.optimizer, params, self.mesh)
        return ClassifierState(params=params, opt_state=opt_state, rng=rng)

    # ------------------------------------------------------------------
    def _batches(self, n: int, shuffle: bool, rng_seed: int):
        order = np.arange(n)
        if shuffle:
            np.random.RandomState(rng_seed).shuffle(order)
        bs = self.spec.batch_size
        for start in range(0, n, bs):
            yield order[start : start + bs]

    def run_epoch(
        self, state: ClassifierState, inputs: np.ndarray, labels: np.ndarray,
        shuffle: bool = True,
    ) -> dict:
        inputs = self.spec.preprocess_inputs(inputs)
        n = inputs.shape[0]
        num_classes = self.spec.num_classes
        onehot = np.eye(num_classes, dtype=np.float32)[labels]
        seed = int(jax.random.randint(state.rng, (), 0, 2**31 - 1))
        state.rng = jax.random.split(state.rng)[0]
        sums, weight = {}, 0.0
        for idx in self._batches(n, shuffle, seed):
            batch = {"x": inputs[idx], "c": onehot[idx]}
            batch, mask = pmesh.pad_batch_to(batch, self.spec.batch_size)
            sh = pmesh.batch_sharding(self.mesh)
            x = jax.device_put(batch["x"], sh)
            c = jax.device_put(batch["c"], sh)
            m = jax.device_put(mask, sh)
            state.params, state.opt_state, metrics = self.train_step(
                state.params, state.opt_state, x, c, m
            )
            w = float(mask.sum())
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v) * w
            weight += w
        return {k: v / weight for k, v in sums.items()} if weight else {}

    # ------------------------------------------------------------------
    # Device-resident chunked epochs: the dataset lives in HBM and E whole
    # epochs run as ONE jitted call (same design as VAETrainer
    # run_epochs_device) -- the per-call dispatch latency of a tunneled
    # chip amortizes over the chunk.
    # ------------------------------------------------------------------
    def _device_epochs_fn(self, params, opt_state, data, orders, masks):
        import jax.numpy as jnp

        model = self.model
        optimizer = self.optimizer

        def batch_body(carry, xs):
            params, opt_state = carry
            idx, m = xs
            safe = jnp.maximum(idx, 0)
            x = jnp.take(data["x"], safe, axis=0)
            c = jnp.take(data["c"], safe, axis=0)
            from ..models.classifier import classifier_loss

            (loss, metrics), grads = jax.value_and_grad(
                lambda p: classifier_loss(model, p, x, c, m), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        def epoch_body(carry, xs):
            order, mask = xs
            carry, metrics = jax.lax.scan(batch_body, carry, (order, mask))
            w = mask.sum(axis=1)
            tot = jnp.maximum(w.sum(), 1.0)
            return carry, {k: jnp.sum(v * w) / tot for k, v in metrics.items()}

        (params, opt_state), metrics = jax.lax.scan(
            epoch_body, (params, opt_state), (orders, masks)
        )
        return params, opt_state, metrics

    def run_epochs_device(
        self, state: ClassifierState, data: dict, n: int, n_epochs: int,
        shuffle: bool = True,
    ) -> list[dict]:
        """E epochs in one jitted call over device-resident (x, c) arrays."""
        import jax.numpy as jnp

        bs = self.spec.batch_size
        n_batches = max(1, (n + bs - 1) // bs)
        seed = int(jax.random.randint(state.rng, (), 0, 2**31 - 1))
        state.rng = jax.random.split(state.rng)[0]
        orders = np.empty((n_epochs, n_batches, bs), np.int32)
        masks = np.empty((n_epochs, n_batches, bs), np.float32)
        for e in range(n_epochs):
            order = np.arange(n)
            if shuffle:
                np.random.RandomState((seed + e) % (2**31)).shuffle(order)
            orders[e], masks[e] = padded_batch_order(order, bs)
        if not hasattr(self, "_device_epochs_jit"):
            self._device_epochs_jit = jax.jit(
                self._device_epochs_fn, donate_argnums=(0, 1)
            )
        state.params, state.opt_state, metrics = self._device_epochs_jit(
            state.params, state.opt_state, data,
            jnp.asarray(orders), jnp.asarray(masks),
        )
        host = {k: np.asarray(v) for k, v in metrics.items()}
        return [
            {k: float(v[e]) for k, v in host.items()} for e in range(n_epochs)
        ]

    def evaluate(
        self,
        state: ClassifierState,
        inputs: np.ndarray,
        labels: np.ndarray,
        preprocessed: bool = False,
    ) -> dict:
        """Loss + accuracy + confusion[true, predicted]. ``preprocessed``
        skips spec.preprocess_inputs (fit preprocesses the test split once
        instead of at every test boundary)."""
        if not preprocessed:
            inputs = self.spec.preprocess_inputs(inputs)
        n = inputs.shape[0]
        num_classes = self.spec.num_classes
        onehot = np.eye(num_classes, dtype=np.float32)[labels]
        confusion = np.zeros((num_classes, num_classes))
        sums, weight = {}, 0.0
        for idx in self._batches(n, shuffle=False, rng_seed=0):
            batch = {"x": inputs[idx], "c": onehot[idx]}
            batch, mask = pmesh.pad_batch_to(batch, self.spec.batch_size)
            sh = pmesh.batch_sharding(self.mesh)
            x = jax.device_put(batch["x"], sh)
            c = jax.device_put(batch["c"], sh)
            m = jax.device_put(mask, sh)
            metrics, probs = self.eval_step(state.params, x, c, m)
            probs = np.asarray(probs)[: len(idx)]
            pred = probs.argmax(-1)
            for t, p in zip(labels[idx], pred):
                confusion[t, p] += 1
            w = float(mask.sum())
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v) * w
            weight += w
        out = {k: v / weight for k, v in sums.items()} if weight else {}
        total = confusion.sum()
        out["accuracy"] = float(np.trace(confusion) / total) if total else 0.0
        out["confusion"] = confusion
        return out

    # ------------------------------------------------------------------
    def fit(
        self,
        state: ClassifierState,
        train_inputs: np.ndarray,
        train_labels: np.ndarray,
        test_inputs: np.ndarray | None = None,
        test_labels: np.ndarray | None = None,
        epochs: int = 10,
        output_dir: str | None = None,
        test_step: int = 1,
        save_step: int = 10,
        log_fn=print,
        class_names: list[str] | None = None,
    ) -> dict:
        import jax.numpy as jnp

        history: dict[str, list] = {"train": [], "test": [], "epoch": []}
        last_saved_epoch = -1
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)

        # dataset uploaded to device memory once; epochs chunked between
        # test/save boundaries and run as single jitted calls
        x_train = self.spec.preprocess_inputs(train_inputs)
        onehot = np.eye(self.spec.num_classes, dtype=np.float32)[train_labels]
        device_data = {"x": jnp.asarray(x_train), "c": jnp.asarray(onehot)}
        n_train = x_train.shape[0]
        x_test = (
            self.spec.preprocess_inputs(test_inputs)
            if test_inputs is not None and len(test_inputs)
            else None
        )

        def is_boundary(x: int) -> bool:
            if test_inputs is not None and len(test_inputs) and x % test_step == 0:
                return True
            return bool(output_dir) and x % save_step == 0

        e = state.epoch
        while e < epochs:
            t0 = time.time()
            b = e
            while b < epochs - 1 and not is_boundary(b):
                b += 1
            per_epoch = self.run_epochs_device(
                state, device_data, n_train, b - e + 1
            )
            train_metrics = per_epoch[-1]
            dt = time.time() - t0
            log_fn(
                f"[{self.spec.kind}] epoch {b}: loss={train_metrics.get('loss', 0):.4f} "
                f"acc={train_metrics.get('acc', 0):.4f} ({dt:.1f}s)"
            )
            for i, m in enumerate(per_epoch):
                history["epoch"].append(e + i)
                history["train"].append(m)
            state.epoch = b + 1
            e = b
            if x_test is not None and e % test_step == 0:
                tm = self.evaluate(state, x_test, test_labels, preprocessed=True)
                confusion = tm.pop("confusion")
                history["test"].append({"epoch": e, **tm})
                log_fn(f"  test acc={tm['accuracy']:.4f} loss={tm.get('loss', 0):.4f}")
                if output_dir and e % save_step == 0:
                    try:
                        from ..utils.plotting import plot_confusion_matrix

                        plot_confusion_matrix(
                            confusion,
                            class_names or [str(i) for i in range(self.spec.num_classes)],
                            tm["accuracy"],
                            os.path.join(output_dir, f"confusion_{e}.png"),
                        )
                    except Exception as err:
                        print(f"confusion plot failed: {err}")
            if output_dir and e % save_step == 0:
                self.save(output_dir, state)
                last_saved_epoch = state.epoch
                with open(os.path.join(output_dir, "history.json"), "w") as f:
                    json.dump(history, f)
            e = b + 1
        if output_dir:
            if last_saved_epoch != state.epoch:  # avoid a duplicate final save
                self.save(output_dir, state)
            with open(os.path.join(output_dir, "history.json"), "w") as f:
                json.dump(history, f)
        return history

    # ------------------------------------------------------------------
    def save(self, output_dir: str, state: ClassifierState) -> None:
        ckpt.save_checkpoint(
            output_dir, state.epoch - 1, state.params, state.opt_state,
            state.rng, None,
        )
        with open(os.path.join(output_dir, "spec.json"), "w") as f:
            json.dump(self.spec.__dict__, f, indent=2)

    def restore(self, output_dir: str, epoch: int | None = None) -> ClassifierState:
        template_state = self.init_state()
        template = {
            "params": template_state.params,
            "opt_state": template_state.opt_state,
            "epoch": np.asarray(0),
            "rng": template_state.rng,
        }
        restored = ckpt.restore_checkpoint(output_dir, epoch, template)
        # re-place with the mesh's sharding policy (see VAETrainer.restore)
        return ClassifierState(
            params=pmesh.shard_params(restored["params"], self.mesh),
            opt_state=pmesh.shard_params(restored["opt_state"], self.mesh),
            rng=jax.device_put(restored["rng"], pmesh.replicated(self.mesh)),
            epoch=restored["epoch"] + 1,
        )


def load_classifier(output_dir: str, epoch: int | None = None) -> tuple[StyleClassifier, Any]:
    """Load a trained classifier (model, params) from its run directory."""
    with open(os.path.join(output_dir, "spec.json")) as f:
        spec = ClassifierSpec(**json.load(f))
    trainer = ClassifierTrainer(spec)
    state = trainer.restore(output_dir, epoch)
    return trainer.model, state.params

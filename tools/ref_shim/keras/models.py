"""Executable keras.models.Model (numpy, forward + loss evaluation).

Supports what the reference's VAE exercises (vae_definition.py:242,
:355-363, :391-441): functional Models over shared graph nodes, Models
called as layers (the decoder/probe sub-Models inside the autoencoder),
``predict``, and ``test_on_batch`` with Keras-2.0.x loss semantics:

  per-output:  score = loss_fn(y_true, y_pred)            # sums/means last axis
               score = mean(score, axes > weight_ndim)    # reduce to weight rank
               score = score * weight / mean(weight != 0) # sample weighting
               loss_i = mean(score)
  total:       sum(loss_weights[i] * loss_i) + sum(add_loss terms fired
               during the forward -- the KLDivergenceLayer beta*KL)

categorical_crossentropy follows the 2.0.x backend exactly: renormalize
probs over the last axis, clip to [1e-7, 1-1e-7], -sum(y*log p)
(the framework's logits-based loss is compared against this to tolerance).
"""

from __future__ import annotations

import numpy as np

from .engine import (
    EvalContext,
    Layer,
    Node,
    evaluate,
    pop_context,
    push_context,
)


def _as_list(x):
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


# ---------------------------------------------------------------------------
# Keras 2.0.x loss + metric functions
# ---------------------------------------------------------------------------

_EPS = 1e-7


def categorical_crossentropy(y_true, y_pred):
    p = y_pred / np.sum(y_pred, axis=-1, keepdims=True)
    p = np.clip(p, _EPS, 1.0 - _EPS)
    return -np.sum(y_true * np.log(p), axis=-1)


def mse(y_true, y_pred):
    return np.mean(np.square(y_pred - y_true), axis=-1)


_LOSSES = {
    "categorical_crossentropy": categorical_crossentropy,
    "mse": mse,
    "mean_squared_error": mse,
}


def _weighted_loss(fn, y_true, y_pred, weights):
    """Keras training.py ``weighted`` wrapper semantics (2.0.x)."""
    from . import engine as _engine

    score = np.asarray(fn(y_true, y_pred), _engine.FLOATX)
    if weights is not None:
        weights = np.asarray(weights, _engine.FLOATX)
        while score.ndim > weights.ndim:
            score = score.mean(axis=-1)
        score = score * weights
        nonzero = np.mean((weights != 0).astype(_engine.FLOATX))
        score = score / nonzero
    return float(np.mean(score))


def _accuracy(y_true, y_pred):
    """Keras metric resolution: binary_accuracy for 1-dim outputs,
    categorical_accuracy otherwise."""
    if y_pred.shape[-1] == 1:
        return float(
            np.mean((np.round(y_pred) == y_true).astype(np.float32))
        )
    return float(
        np.mean(
            (np.argmax(y_pred, -1) == np.argmax(y_true, -1)).astype(
                np.float32
            )
        )
    )


class Model(Layer):
    def __init__(self, inputs=None, outputs=None, name=None, **kwargs):
        super().__init__(name=name)
        self.input_nodes: list[Node] = _as_list(inputs)
        self.output_nodes: list[Node] = _as_list(outputs)
        self._multi_output = isinstance(outputs, (list, tuple))
        self.built = True
        self.loss = None
        self.loss_weights = None
        self.sample_weight_mode = None
        self.metrics = None

    # -- direct execution ---------------------------------------------------
    def _forward(self, x) -> list[np.ndarray]:
        values = _as_list(x)
        if len(values) != len(self.input_nodes):
            raise ValueError(
                f"model {self.name!r} expects {len(self.input_nodes)} "
                f"inputs, got {len(values)}"
            )
        from . import engine as _engine

        feed = {}
        for node, v in zip(self.input_nodes, values):
            v = np.asarray(v, _engine.FLOATX)
            if v.ndim == len(node.shape) - 1:
                # Keras _standardize_input_data: a (B,) array feeds an
                # Input(shape=(1,)) (the reference's velocity start symbol,
                # vae_definition.py:296 fed np.zeros((B,)))
                v = v[..., None]
            feed[node] = v
        return evaluate(self.output_nodes, feed)

    def predict(self, x, batch_size=None, verbose=0):
        out = self._forward(x)
        return out if self._multi_output else out[0]

    # -- model-as-layer -----------------------------------------------------
    def call(self, values):
        out = self._forward(values)
        return out if self._multi_output else out[0]

    def compute_output_shape(self, input_shapes):
        shapes = [n.shape for n in self.output_nodes]
        return shapes if self._multi_output else shapes[0]

    # -- compile / evaluate ---------------------------------------------------
    def compile(
        self,
        optimizer=None,
        loss=None,
        loss_weights=None,
        sample_weight_mode=None,
        metrics=None,
        **_kwargs,
    ):
        self.optimizer = optimizer
        self.loss = loss
        self.loss_weights = loss_weights
        self.sample_weight_mode = sample_weight_mode
        self.metrics = metrics

    def test_on_batch(self, x, y, sample_weight=None) -> dict:
        """Forward + full Keras loss bookkeeping. Returns a dict:
        total / output_losses / add_loss / accuracies / predictions."""
        ctx = EvalContext()
        push_context(ctx)
        try:
            preds = self._forward(x)
        finally:
            pop_context()
        targets = _as_list(y)
        losses = _as_list(self.loss) or ["categorical_crossentropy"]
        if len(losses) == 1 and len(targets) > 1:
            losses = losses * len(targets)
        weights = _as_list(self.loss_weights) or [1.0] * len(targets)
        sw = _as_list(sample_weight) or [None] * len(targets)

        output_losses = []
        accuracies = []
        for pred, target, loss_name, w in zip(preds, targets, losses, sw):
            fn = _LOSSES[loss_name]
            target = np.asarray(target)
            output_losses.append(_weighted_loss(fn, target, pred, w))
            accuracies.append(_accuracy(target, pred))

        add_loss = float(sum(ctx.losses))
        total = (
            float(sum(lw * l for lw, l in zip(weights, output_losses)))
            + add_loss
        )
        return {
            "total": total,
            "output_losses": output_losses,
            "add_loss": add_loss,
            "accuracies": accuracies,
            "predictions": preds,
        }

    def summary(self):
        return f"<shim Model {self.name}: {len(self.output_nodes)} outputs>"


class Sequential(Model):
    """Imported by the classifier scripts; not constructed by any path the
    parity checker executes."""

    def __init__(self, layers=None, name=None):
        raise NotImplementedError(
            "shim Sequential: no executing reference path constructs it"
        )

"""Style classifiers: one GRU-classifier module, three input configurations.

Replaces the reference's three near-identical scripts
(/root/reference/pitch_classifier.py, velocity_classifier.py,
instrument_classifier.py -- 816 LoC of copy-paste) with a single module:

  2x GRU(256) -> Dense softmax over num_classes       (pitch_classifier.py:89-103)

Input kinds (SURVEY.md §2.1):
  * 'pitch':      note windows  (B, input_length, input_dim)
  * 'velocity':   velocity seq  (B, output_length, 1)   (velocity_classifier.py)
  * 'instrument': inst matrix   (B, max_voices, instrument_dim)

Also the ensemble judge: weighted average of the three classifier softmaxes
with weights 0.999-0.5 each (vae_evaluation.py:81-117).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .cells import dense_apply, dense_init, get_cell
from .rnn import encode_sequence

Params = dict[str, Any]

CLASSIFIER_KINDS = ("pitch", "velocity", "instrument")


@dataclass(frozen=True)
class ClassifierSpec:
    kind: str
    input_dim: int
    num_classes: int
    lstm_size: int = 256
    num_layers: int = 2
    cell_type: str = "GRU"
    gate_activation: str = "sigmoid"
    learning_rate: float = 2e-5
    batch_size: int = 512
    # velocity-kind preprocessing (velocity_classifier.py:58-71,138-144)
    only_train_note_starts: bool = False
    scale_velocity_between_0_and_1: bool = False
    velocity_threshold: float = 0.5

    # reference per-kind learning rates: pitch/velocity 2e-5
    # (pitch_classifier.py:42, velocity_classifier.py:46), instrument 1e-5
    # (instrument_classifier.py:48)
    DEFAULT_LEARNING_RATES = {"pitch": 2e-5, "velocity": 2e-5, "instrument": 1e-5}

    @classmethod
    def for_kind(cls, kind: str, cfg: Config, **overrides) -> "ClassifierSpec":
        dims = {
            "pitch": cfg.input_dim,
            "velocity": 1,
            "instrument": cfg.instrument_dim,
        }
        if kind not in dims:
            raise ValueError(f"unknown classifier kind {kind!r}")
        base = dict(
            kind=kind,
            input_dim=dims[kind],
            num_classes=cfg.num_classes,
            cell_type=cfg.cell_type,
            gate_activation=cfg.gate_activation,
            learning_rate=cls.DEFAULT_LEARNING_RATES[kind],
            velocity_threshold=cfg.velocity_threshold,
        )
        base.update(overrides)
        return cls(**base)

    def preprocess_inputs(self, x):
        """Kind-specific input transforms (velocity_classifier.py:138-144)."""
        if self.kind != "velocity":
            return x
        x = np.copy(np.asarray(x))
        if self.scale_velocity_between_0_and_1:
            nz = np.nonzero(x)
            x[nz] = (x[nz] - self.velocity_threshold) / (1.0 - self.velocity_threshold)
        if self.only_train_note_starts:
            x[np.nonzero(x)] = 1
        return x


class StyleClassifier:
    """Stacked-GRU sequence classifier; pure functions + param pytree.

    ``platform``: platform of the COMPUTE devices (see MidiVAE.__init__) --
    'tpu' enables the fused whole-layer Pallas encoder kernels for both the
    training loss and predict; None keys off the default backend.
    """

    def __init__(self, spec: ClassifierSpec, platform: str | None = None):
        self.spec = spec
        self.platform = platform
        self.cell = get_cell(spec.cell_type)

    def _pallas_enabled(self) -> bool:
        if self.spec.cell_type not in ("GRU", "LSTM"):
            return False
        if getattr(self.spec, "gate_activation", "sigmoid") != "sigmoid":
            return False  # kernels implement exact-sigmoid gates only
        if self.platform is not None:
            return self.platform == "tpu"
        return jax.default_backend() == "tpu"

    def init_params(self, key: jax.Array) -> Params:
        # plain-numpy init; see MidiVAE.init_params
        return self._init_params_impl(key)

    def _init_params_impl(self, key: jax.Array) -> Params:
        spec = self.spec
        from .cells import split_keys

        keys = split_keys(key, spec.num_layers + 1)
        layers = []
        d = spec.input_dim
        for i in range(spec.num_layers):
            layers.append(self.cell.init(keys[i], d, spec.lstm_size))
            d = spec.lstm_size
        return {
            "rnn": layers,
            "out": dense_init(keys[-1], spec.lstm_size, spec.num_classes),
        }

    def logits(
        self, params: Params, x: jnp.ndarray, inference: bool = False
    ) -> jnp.ndarray:
        h = encode_sequence(
            params["rnn"], x, self.spec.cell_type, "tanh",
            fused=self._pallas_enabled(),
            inference=inference,
            gate_activation=self.spec.gate_activation,
        )
        return dense_apply(params["out"], h)

    def predict(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Softmax class probabilities -- the Keras ``model.predict``."""
        return jax.nn.softmax(self.logits(params, x, inference=True), axis=-1)


def classifier_loss(
    model: StyleClassifier,
    params: Params,
    x: jnp.ndarray,
    c_onehot: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Categorical crossentropy + accuracy (pitch_classifier.py:102-103)."""
    logits = model.logits(params, x)
    xent = -jnp.sum(c_onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    correct = (jnp.argmax(logits, -1) == jnp.argmax(c_onehot, -1)).astype(jnp.float32)
    if mask is not None:
        denom = jnp.maximum(jnp.sum(mask), 1e-8)
        loss = jnp.sum(xent * mask) / denom
        acc = jnp.sum(correct * mask) / denom
    else:
        loss = jnp.mean(xent)
        acc = jnp.mean(correct)
    return loss, {"loss": loss, "acc": acc}


# ---------------------------------------------------------------------------
# Ensemble judge (vae_evaluation.py:110-117)
# ---------------------------------------------------------------------------

DEFAULT_ENSEMBLE_WEIGHT = 0.999 - 0.5  # subtract 0.5: a random judge weighs 0


def ensemble_prediction(
    pitch_probs: jnp.ndarray,
    instrument_probs: jnp.ndarray,
    velocity_probs: jnp.ndarray,
    weights: tuple[float, float, float] = (
        DEFAULT_ENSEMBLE_WEIGHT,
        DEFAULT_ENSEMBLE_WEIGHT,
        DEFAULT_ENSEMBLE_WEIGHT,
    ),
) -> jnp.ndarray:
    wp, wi, wv = weights
    return (pitch_probs * wp + instrument_probs * wi + velocity_probs * wv) / (
        wp + wi + wv
    )


def make_judge(model, params):
    """Wrap a trained (StyleClassifier, params) into a padded numpy-in,
    probs-out predict callable (the judge form the evaluation harness and
    transfer CLI consume): inputs preprocessed per the classifier spec,
    bucket-padded to keep jit shapes static, trimmed on return."""
    from ..data.batching import bucket_pow2

    jitted = jax.jit(model.predict)
    spec = model.spec

    def predict(x):
        x = np.asarray(spec.preprocess_inputs(x), np.float32)
        n = x.shape[0]
        xp = np.zeros((bucket_pow2(n), *x.shape[1:]), np.float32)
        xp[:n] = x
        return np.asarray(jitted(params, xp))[:n]

    return predict


def classifier_inputs_for_kind(kind: str, X, V, I):
    """Select the classifier input arrays from window tensors.

    For 'instrument' the reference feeds ONE instrument matrix per song
    (instrument_classifier.py:231-237); callers pass per-window tiles and may
    deduplicate per song themselves.
    """
    if kind == "pitch":
        return X
    if kind == "velocity":
        return V
    if kind == "instrument":
        return I
    raise ValueError(f"unknown classifier kind {kind!r}")

"""Executable keras.backend (numpy): the K.* ops the reference's model code
actually evaluates -- KLDivergenceLayer.call (vae_definition.py:29-36) and
the reparameterization Lambda (vae_definition.py:498-502).

``random_normal`` draws from a module RNG the checker seeds; with
stddev=0 (the evaluation-mode epsilon_std, vae_evaluation.py:482-486) it is
exactly zeros, making forwards deterministic. The checker may also pin a
fixed epsilon via ``set_fixed_normal`` to exercise the exp(logvar/2) scaling.
"""

from __future__ import annotations

import numpy as np

_RNG = np.random.default_rng(0)
_FIXED_NORMAL: np.ndarray | None = None


def seed(s: int) -> None:
    global _RNG
    _RNG = np.random.default_rng(s)


def set_fixed_normal(eps) -> None:
    """Pin the next random_normal draws to a fixed array (None to unpin)."""
    global _FIXED_NORMAL
    _FIXED_NORMAL = None if eps is None else np.asarray(eps, np.float32)


def epsilon() -> float:
    return 1e-7


def floatx() -> str:
    return "float32"


def shape(x):
    return np.shape(x)


def ndim(x):
    return np.ndim(x)


def cast(x, dtype):
    return np.asarray(x, dtype=np.dtype(dtype))


def constant(value, dtype="float32", shape=None):
    arr = np.asarray(value, dtype=np.dtype(dtype))
    if shape is not None:
        arr = np.broadcast_to(arr, shape).copy()
    return arr


def exp(x):
    return np.exp(x)


def log(x):
    return np.log(x)


def sqrt(x):
    return np.sqrt(x)


def square(x):
    return np.square(x)


def abs(x):  # noqa: A001 - keras API name
    return np.abs(x)


def sum(x, axis=None, keepdims=False):  # noqa: A001 - keras API name
    return np.sum(x, axis=axis, keepdims=keepdims)


def mean(x, axis=None, keepdims=False):
    return np.mean(x, axis=axis, keepdims=keepdims)


def clip(x, min_value, max_value):
    return np.clip(x, min_value, max_value)


def not_equal(x, y):
    return np.not_equal(x, y)


def equal(x, y):
    return np.equal(x, y)


def round(x):  # noqa: A001 - keras API name
    return np.round(x)


def argmax(x, axis=-1):
    return np.argmax(x, axis=axis)


def random_normal(shape, mean=0.0, stddev=1.0, dtype=None, seed=None):
    if _FIXED_NORMAL is not None:
        return mean + stddev * np.broadcast_to(_FIXED_NORMAL, shape).astype(
            "float32"
        )
    if stddev == 0.0:
        return np.full(shape, mean, dtype="float32")
    return _RNG.normal(mean, stddev, size=shape).astype("float32")

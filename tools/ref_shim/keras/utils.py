"""keras.utils.to_categorical -- FAITHFUL reimplementation (the one keras
function the reference's numpy-only batch prep actually executes,
vae_definition.py:919): scalar input -> (num_classes,) float one-hot,
array input of shape s -> s + (num_classes,)."""

import numpy as np


def to_categorical(y, num_classes=None, dtype="float32"):
    y = np.array(y, dtype="int")
    input_shape = y.shape
    if input_shape and input_shape[-1] == 1 and len(input_shape) > 1:
        input_shape = tuple(input_shape[:-1])
    y = y.ravel()
    if not num_classes:
        num_classes = int(np.max(y)) + 1
    n = y.shape[0]
    categorical = np.zeros((n, num_classes), dtype=dtype)
    categorical[np.arange(n), y] = 1
    return np.reshape(categorical, input_shape + (num_classes,))

"""Executable recurrentshop cells: called functionally inside the
reference's decoder step graphs (vae_definition.py:534-536 etc.) as
``Cell(size)([x, *states]) -> (output, *new_states)``.

Cell math comes from keras/_math.py (the shim-supplied primitive layer);
weight layout matches the Keras layers so one transplant schedule covers
both. State order follows the Keras convention: GRU/SimpleRNN carry (h,),
LSTM carries (h, c) -- the reference's per-layer state-init Denses
therefore initialize h first (vae_definition.py:563-570 creation order).
"""

from __future__ import annotations

import numpy as np

from keras import _math
from keras.engine import Layer


class _CellBase(Layer):
    gates = 1
    num_states = 1

    def __init__(self, units, activation="tanh", name=None, **_kwargs):
        super().__init__(name=name)
        self.units = int(units)
        self.activation = _math.get_activation(activation)

    def build(self, input_shapes):
        in_dim = int(input_shapes[0][-1])
        g = self.gates
        self.kernel = np.zeros((in_dim, g * self.units), np.float32)
        self.recurrent_kernel = np.zeros(
            (self.units, g * self.units), np.float32
        )
        self.bias = np.zeros((g * self.units,), np.float32)
        self._register()

    def compute_output_shape(self, input_shapes):
        return [
            (input_shapes[0][0], self.units)
            for _ in range(1 + self.num_states)
        ]


class GRUCell(_CellBase):
    gates = 3
    num_states = 1

    def call(self, values):
        x, h = values
        out, (new_h,) = _math.gru_step(
            x, h, self.kernel, self.recurrent_kernel, self.bias,
            self.activation,
        )
        return [out, new_h]


class LSTMCell(_CellBase):
    gates = 4
    num_states = 2

    def call(self, values):
        x, h, c = values
        out, (new_h, new_c) = _math.lstm_step(
            x, (h, c), self.kernel, self.recurrent_kernel, self.bias,
            self.activation,
        )
        return [out, new_h, new_c]


class SimpleRNNCell(_CellBase):
    gates = 1
    num_states = 1

    def call(self, values):
        x, h = values
        out, (new_h,) = _math.simple_step(
            x, h, self.kernel, self.recurrent_kernel, self.bias,
            self.activation,
        )
        return [out, new_h]

"""Executable keras.layers (numpy) -- the layer set the reference's model
code constructs (vae_definition.py:2-8, :212-761; classifier builders).

Weight layouts and equations follow Keras 2.0.x; see keras/_math.py for the
cell math (the one place shim-supplied semantics enter). Weights are built
as ZEROS -- the parity checker transplants the framework's parameters via
``engine.LAYER_REGISTRY`` -- so no initializer semantics matter here.
"""

from __future__ import annotations

import numpy as np

from .. import _math
from ..engine import Input, Layer  # noqa: F401  (Input re-exported)


class Dense(Layer):
    def __init__(
        self,
        units,
        activation=None,
        name=None,
        kernel_initializer="glorot_uniform",
        bias_initializer="zeros",
        **_kwargs,
    ):
        super().__init__(name=name)
        self.units = int(units)
        self.activation = _math.get_activation(activation)

    def build(self, input_shape):
        in_dim = int(input_shape[-1])
        self.kernel = np.zeros((in_dim, self.units), np.float32)
        self.bias = np.zeros((self.units,), np.float32)
        self._register()

    def call(self, x):
        return self.activation(x @ self.kernel + self.bias)

    def compute_output_shape(self, input_shape):
        return tuple(input_shape[:-1]) + (self.units,)


class Embedding(Layer):
    def __init__(self, input_dim, output_dim, input_length=None, name=None, **_kw):
        super().__init__(name=name)
        self.input_dim = int(input_dim)
        self.output_dim = int(output_dim)

    def build(self, input_shape):
        self.embeddings = np.zeros(
            (self.input_dim, self.output_dim), np.float32
        )
        self._register()

    def call(self, x):
        return self.embeddings[np.asarray(x, np.int64)]

    def compute_output_shape(self, input_shape):
        return tuple(input_shape) + (self.output_dim,)


class _RNNBase(Layer):
    """Shared full-sequence RNN layer (Keras GRU/LSTM/SimpleRNN)."""

    gates = 1
    num_states = 1

    def __init__(
        self,
        units,
        return_sequences=False,
        activation="tanh",
        go_backwards=False,
        name=None,
        **_kwargs,
    ):
        super().__init__(name=name)
        self.units = int(units)
        self.return_sequences = bool(return_sequences)
        self.activation = _math.get_activation(activation)
        self.activation_name = activation
        self.go_backwards = bool(go_backwards)

    def build(self, input_shape):
        in_dim = int(input_shape[-1])
        g = self.gates
        self.kernel = np.zeros((in_dim, g * self.units), np.float32)
        self.recurrent_kernel = np.zeros(
            (self.units, g * self.units), np.float32
        )
        self.bias = np.zeros((g * self.units,), np.float32)
        self._register()

    def _step(self, x_t, states):
        raise NotImplementedError

    def call(self, x):
        x = np.asarray(x)  # dtype preserved (f64 under the gradient check)
        B, T, _ = x.shape
        states = tuple(
            np.zeros((B, self.units), x.dtype)
            for _ in range(self.num_states)
        )
        order = range(T - 1, -1, -1) if self.go_backwards else range(T)
        seq = []
        out = None
        for t in order:
            out, states = self._step(x[:, t], states)
            if self.return_sequences:
                seq.append(out)
        if self.return_sequences:
            # Keras semantics: go_backwards emits reverse-time order;
            # Bidirectional re-reverses afterwards.
            return np.stack(seq, axis=1)
        return out

    def compute_output_shape(self, input_shape):
        if self.return_sequences:
            return (input_shape[0], input_shape[1], self.units)
        return (input_shape[0], self.units)


class GRU(_RNNBase):
    gates = 3
    num_states = 1

    def _step(self, x_t, states):
        (h,) = states
        return _math.gru_step(
            x_t, h, self.kernel, self.recurrent_kernel, self.bias,
            self.activation,
        )


class LSTM(_RNNBase):
    gates = 4
    num_states = 2

    def _step(self, x_t, states):
        return _math.lstm_step(
            x_t, states, self.kernel, self.recurrent_kernel, self.bias,
            self.activation,
        )


class SimpleRNN(_RNNBase):
    gates = 1
    num_states = 1

    def _step(self, x_t, states):
        (h,) = states
        return _math.simple_step(
            x_t, h, self.kernel, self.recurrent_kernel, self.bias,
            self.activation,
        )


class Bidirectional(Layer):
    """concat-merge wrapper: forward copy + backward copy of the wrapped
    layer (registered forward-first, matching the framework's
    {fwd, bwd} param dicts)."""

    def __init__(self, layer, merge_mode="concat", name=None):
        super().__init__(name=name)
        if merge_mode != "concat":
            raise ValueError("shim Bidirectional supports merge_mode='concat'")
        cls = type(layer)
        self.forward_layer = layer
        self.backward_layer = cls(
            layer.units,
            return_sequences=layer.return_sequences,
            activation=layer.activation_name,
            go_backwards=True,
            name=layer.name + "_bwd",
        )

    def build(self, input_shape):
        self.forward_layer.build(input_shape)
        self.forward_layer.built = True
        self.backward_layer.build(input_shape)
        self.backward_layer.built = True

    def call(self, x):
        fwd = self.forward_layer.call(x)
        bwd = self.backward_layer.call(x)
        if self.forward_layer.return_sequences:
            bwd = bwd[:, ::-1]
        return np.concatenate([fwd, bwd], axis=-1)

    def compute_output_shape(self, input_shape):
        s = self.forward_layer.compute_output_shape(input_shape)
        return tuple(s[:-1]) + (2 * s[-1],)


class Concatenate(Layer):
    def __init__(self, axis=-1, name=None):
        super().__init__(name=name)
        self.axis = axis

    def call(self, values):
        return np.concatenate(values, axis=self.axis)

    def compute_output_shape(self, input_shapes):
        out = list(input_shapes[0])
        out[self.axis] = sum(int(s[self.axis]) for s in input_shapes)
        return tuple(out)


class Lambda(Layer):
    def __init__(self, function, output_shape=None, name=None, **_kwargs):
        super().__init__(name=name)
        self.function = function
        self._output_shape = output_shape

    def call(self, values):
        return self.function(values)

    def compute_output_shape(self, input_shapes):
        if self._output_shape is not None:
            return (None,) + tuple(self._output_shape)
        # infer on zeros (the slicing lambdas are shape-safe);
        # input_shapes is a list of tuples for multi-input calls
        if isinstance(input_shapes, list):
            dummy = [
                np.zeros((2,) + tuple(s[1:]), np.float32)
                for s in input_shapes
            ]
        else:
            dummy = np.zeros((2,) + tuple(input_shapes[1:]), np.float32)
        out = self.function(dummy)
        return (None,) + tuple(np.shape(out)[1:])


class Activation(Layer):
    def __init__(self, activation, name=None):
        super().__init__(name=name)
        self.activation = _math.get_activation(activation)

    def call(self, x):
        return self.activation(x)


class Add(Layer):
    def call(self, values):
        out = values[0]
        for v in values[1:]:
            out = out + v
        return out

    def compute_output_shape(self, input_shapes):
        return tuple(input_shapes[0])


class Dropout(Layer):
    """Inference-mode identity (classifier builders construct Dropout)."""

    def __init__(self, rate, name=None, **_kwargs):
        super().__init__(name=name)
        self.rate = rate

    def call(self, x):
        return x


class _Inert:
    """Placeholder for imported-but-never-constructed layer names."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            f"{self.__class__.__name__}: not constructed by any executing "
            "reference path; shim keeps it inert"
        )


class RepeatVector(_Inert):
    pass


class TimeDistributed(_Inert):
    pass


from . import merge  # noqa: E402,F401

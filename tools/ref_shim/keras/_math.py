"""Numpy implementations of the Keras-2.0.x primitive math the reference's
layers delegate to the backend.

These are the ONLY semantics the shim supplies rather than executes from
/root/reference: activation functions and the per-step RNN cell equations
(classic reset-before GRU, standard LSTM with i/f/g/o gate order, SimpleRNN).
Everything else -- graph wiring, dims, activations chosen per layer, the KL
formula, loss assembly -- executes from the reference's own source.

Gate (recurrent) activation: Keras 2.0.8's GRU/LSTM default is
``hard_sigmoid`` (clip(0.2x+0.5, 0, 1)); modern stacks use exact sigmoid.
``GATE_ACTIVATION`` is module state so the differential checker can align the
shim with whichever convention the framework config under test uses
(midi_vae_tpu Config.gate_activation).
"""

from __future__ import annotations

import numpy as np

# 'hard_sigmoid' = faithful Keras 2.0.8 default; the checker sets this to
# match cfg.gate_activation on the framework side.
GATE_ACTIVATION = "hard_sigmoid"


def linear(x):
    return x


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def hard_sigmoid(x):
    return np.clip(0.2 * x + 0.5, 0.0, 1.0)


def softmax(x):
    e = np.exp(x - np.max(x, axis=-1, keepdims=True))
    return e / np.sum(e, axis=-1, keepdims=True)


def relu(x):
    return np.maximum(x, 0.0)


def softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0.0)


def elu(x):
    return np.where(x > 0, x, np.expm1(x))


ACTIVATIONS = {
    "linear": linear,
    None: linear,
    "sigmoid": sigmoid,
    "hard_sigmoid": hard_sigmoid,
    "softmax": softmax,
    "tanh": np.tanh,
    "relu": relu,
    "softplus": softplus,
    "elu": elu,
}


def get_activation(name):
    if callable(name):
        return name
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"shim: unknown activation {name!r}") from None


def gate_activation():
    return get_activation(GATE_ACTIVATION)


# ---------------------------------------------------------------------------
# Cell steps. Weight layouts follow Keras 2.0.x:
#   GRU   kernel (D, 3H) gates z|r|h, recurrent_kernel (H, 3H), bias (3H,)
#   LSTM  kernel (D, 4H) gates i|f|g|o, recurrent_kernel (H, 4H), bias (4H,)
#   SimpleRNN kernel (D, H), recurrent_kernel (H, H), bias (H,)
# ---------------------------------------------------------------------------

def gru_step(x_t, h, kernel, recurrent_kernel, bias, act):
    H = h.shape[-1]
    gate = gate_activation()
    xp = x_t @ kernel + bias
    hu = h @ recurrent_kernel[:, : 2 * H]
    z = gate(xp[:, :H] + hu[:, :H])
    r = gate(xp[:, H : 2 * H] + hu[:, H:])
    hh = act(xp[:, 2 * H :] + (r * h) @ recurrent_kernel[:, 2 * H :])
    new_h = z * h + (1.0 - z) * hh
    return new_h, (new_h,)


def lstm_step(x_t, states, kernel, recurrent_kernel, bias, act):
    h, c = states
    H = h.shape[-1]
    gate = gate_activation()
    gates = x_t @ kernel + bias + h @ recurrent_kernel
    i = gate(gates[:, :H])
    f = gate(gates[:, H : 2 * H])
    g = act(gates[:, 2 * H : 3 * H])
    o = gate(gates[:, 3 * H :])
    new_c = f * c + i * g
    new_h = o * act(new_c)
    return new_h, (new_h, new_c)


def simple_step(x_t, h, kernel, recurrent_kernel, bias, act):
    new_h = act(x_t @ kernel + bias + h @ recurrent_kernel)
    return new_h, (new_h,)

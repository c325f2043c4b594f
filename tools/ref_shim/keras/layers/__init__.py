"""Inert keras.layers: importable names for vae_definition.py:2-8; layer
instances are never constructed by the parity checker."""


class Layer:
    def __init__(self, *args, **kwargs):
        pass

    def add_loss(self, *args, **kwargs):
        pass


class _Inert:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("keras layers shim: layers are not executable")


Bidirectional = Dense = Embedding = Input = Lambda = LSTM = _Inert
RepeatVector = TimeDistributed = Add = GRU = SimpleRNN = _Inert
Concatenate = _Inert

from . import merge  # noqa: E402,F401

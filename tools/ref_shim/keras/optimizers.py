"""keras.optimizers: records the configuration only. The reference
constructs these inside VAE.create (vae_definition.py:174-175) and the
classifier builders; the parity checker never runs a Keras train step --
training parity is established at the loss/gradient level on the framework
side."""

from __future__ import annotations


class Optimizer:
    def __init__(self, lr=0.001, **kwargs):
        self.lr = lr
        self.config = dict(kwargs)


class Adam(Optimizer):
    pass


class RMSprop(Optimizer):
    pass


class SGD(Optimizer):
    pass

"""Inert keras.backend: vae_definition.py:1 binds it as K but only calls it
inside model-building/layer code the parity checker never runs."""


def _inert(*_args, **_kwargs):
    raise NotImplementedError("keras backend shim: graph ops are not executable")


def __getattr__(name):  # any K.foo resolves to an inert callable
    return _inert

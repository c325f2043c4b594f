"""Inert recurrentshop: vae_definition.py:6 star-imports it; the parity
checker never builds recurrent graphs."""


class _Inert:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("recurrentshop shim: not executable")


RecurrentModel = RecurrentSequential = _Inert

__all__ = ["RecurrentModel", "RecurrentSequential"]

from . import cells  # noqa: E402,F401

"""keras.layers.merge: the reference imports Concatenate from here
(vae_definition.py:8)."""

from . import Add, Concatenate  # noqa: F401

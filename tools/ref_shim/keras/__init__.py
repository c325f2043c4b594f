"""keras shim: lets the reference's vae_definition.py IMPORT so its
numpy-only batch-prep/sampling functions (vae_definition.py:770-1235) can be
executed unmodified by the differential parity checker.

Only ``keras.utils.to_categorical`` needs real behavior (it is called inside
prepare_autoencoder_input_and_output_list, vae_definition.py:919); everything
graph-related is inert placeholder classes -- the checker never builds a
Keras model.
"""

from . import backend, layers, models, objectives, utils  # noqa: F401

__version__ = "2.0-shim"

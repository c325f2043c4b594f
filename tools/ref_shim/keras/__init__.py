"""EXECUTABLE keras shim (numpy): lets the reference's vae_definition.py
both import AND run -- the numpy-only batch-prep/sampling free functions
(vae_definition.py:770-1235) and, since round 2's model-parity work, the
full ``VAE.create`` graph assembly (vae_definition.py:39-761): functional
Models, RNN layers, the KLDivergenceLayer add_loss path, and Keras-2.0.x
loss bookkeeping (models.py).

Semantics supplied by the shim rather than executed from the reference:
the primitive cell equations and activations (_math.py -- including the
Keras-2.0.8 hard_sigmoid gate default), graph evaluation order, and zero
weight init (the parity checker transplants the framework's parameters).
Everything else -- wiring, dims, per-layer activations, the KL formula,
loss weights/sample-weight modes -- executes from /root/reference.
"""

from . import backend, engine, layers, models, objectives, optimizers, utils  # noqa: F401

__version__ = "2.0-shim"

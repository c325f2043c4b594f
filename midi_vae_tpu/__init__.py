"""TPU-native MIDI-VAE framework.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of
brunnergino/MIDI-VAE (ISMIR 2018): MIDI corpus tensorization, a recurrent
beta-VAE with a multi-head autoregressive decoder and latent style probes,
style classifiers, and a full evaluation/generation harness.
"""

from .config import Config, small_test_config

__version__ = "0.1.0"
__all__ = ["Config", "small_test_config"]

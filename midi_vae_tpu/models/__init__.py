from .vae import MidiVAE, loss_and_metrics, kl_divergence
from . import cells, rnn

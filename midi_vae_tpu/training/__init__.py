from .trainer import VAETrainer, TrainState, make_optimizer
from . import checkpoint

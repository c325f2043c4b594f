from . import generation, harness, probes, sampling, stats, sweep
from .generation import GenerationContext
from .harness import EvalSections, Evaluator

from . import music
from . import plotting
from . import profiling

# NOTE: utils.synthetic imports from data.batching; import it directly
# (midi_vae_tpu.utils.synthetic) to avoid a circular import at package init.

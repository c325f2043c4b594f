from . import smf, tensorize, dataset
from .tensorize import (
    SongTensors,
    load_rolls,
    load_rolls_from_path,
    programs_to_instrument_matrix,
    instrument_matrix_to_programs,
    rolls_to_midi,
    save_rolls_as_midi,
)
from .dataset import Dataset, import_midi_from_folder
from . import batching

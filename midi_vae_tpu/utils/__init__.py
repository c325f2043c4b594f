from . import music

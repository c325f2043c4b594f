from . import Concatenate  # noqa: F401

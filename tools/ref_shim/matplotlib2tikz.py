"""matplotlib2tikz shim: the reference's data_class.py imports ``save``
(data_class.py:12) for .tex plot export next to every PNG. The package is not
in this image and SURVEY.md §2.2 drops tikz export by design; the differential
parity checker only needs data_class's NUMERIC functions, so ``save`` is a
no-op stub.
"""


def save(*_args, **_kwargs) -> None:
    return None

"""Native (C++) components, loaded via ctypes with lazy compilation.

No pybind11 in this image, so the native layer exposes a plain C ABI and
Python talks to it with ctypes. The shared library is built on first use
with g++ (cached next to the source); any failure falls back to the pure-
Python implementations transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_DIR, "libsmf_parser.so")
_SRC_PATH = os.path.join(_DIR, "smf_parser.cpp")

_lib = None
_load_failed = False


class _SmfResult(ctypes.Structure):
    _fields_ = [
        ("format", ctypes.c_int32),
        ("division", ctypes.c_int32),
        ("n_notes", ctypes.c_int64),
        ("note_data", ctypes.POINTER(ctypes.c_int64)),
        ("n_tempo", ctypes.c_int64),
        ("tempo_data", ctypes.POINTER(ctypes.c_int64)),
        ("n_timesig", ctypes.c_int64),
        ("ts_data", ctypes.POINTER(ctypes.c_int64)),
        ("error", ctypes.c_char * 256),
    ]


def _build() -> bool:
    try:
        have_so = os.path.exists(_SO_PATH)
        if not os.path.exists(_SRC_PATH):
            # shipped-.so deployment: load what's there
            return have_so
        if have_so and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH):
            return True
        # compile to a unique temp file and rename into place: parallel
        # import workers all race the first build, and a non-atomic g++
        # write can be mmap'd half-written by a sibling's CDLL
        tmp = f"{_SO_PATH}.{os.getpid()}.tmp"
        result = subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", tmp, _SRC_PATH],
            capture_output=True, timeout=120,
        )
        if result.returncode != 0:
            if os.path.exists(tmp):
                os.unlink(tmp)
            return have_so
        os.replace(tmp, _SO_PATH)
        return True
    except Exception:
        return False


def get_smf_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.smf_parse.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(_SmfResult),
        ]
        lib.smf_parse.restype = ctypes.c_int
        lib.smf_free.argtypes = [ctypes.POINTER(_SmfResult)]
        lib.smf_free.restype = None
        _lib = lib
        return _lib
    except OSError:
        _load_failed = True
        return None


def parse_smf_native(data: bytes):
    """Parse SMF bytes with the C++ core.

    Returns (format, division, notes, tempos, timesigs) -- division is the
    RAW MThd word (bit 15 set = SMPTE; decode with smf.decode_division) and
    the arrays are numpy int64 of shapes (n,7), (n,2), (n,3) -- or None if
    the native library is unavailable. Raises ValueError on malformed files
    (same contract as the Python parser).
    """
    import numpy as np

    lib = get_smf_lib()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    result = _SmfResult()
    rc = lib.smf_parse(buf, len(data), ctypes.byref(result))
    try:
        if rc != 0:
            from ..data.smf import MidiParseError

            raise MidiParseError(
                result.error.decode() or "SMF parse error"
            )
        notes = np.ctypeslib.as_array(
            result.note_data, shape=(result.n_notes, 7)
        ).copy() if result.n_notes else np.zeros((0, 7), np.int64)
        tempos = np.ctypeslib.as_array(
            result.tempo_data, shape=(result.n_tempo, 2)
        ).copy() if result.n_tempo else np.zeros((0, 2), np.int64)
        timesigs = np.ctypeslib.as_array(
            result.ts_data, shape=(result.n_timesig, 3)
        ).copy() if result.n_timesig else np.zeros((0, 3), np.int64)
        return (int(result.format), int(result.division), notes, tempos,
                timesigs)
    finally:
        lib.smf_free(ctypes.byref(result))

"""Synthetic dataset generators for tests, dry runs and benchmarks."""

from __future__ import annotations

import numpy as np

from ..config import Config
from ..data.batching import FlatSplit


def onehot_seq(rng, n: int, T: int, D: int) -> np.ndarray:
    idx = rng.randint(0, D, size=(n, T))
    out = np.zeros((n, T, D), np.float32)
    for b in range(n):
        out[b, np.arange(T), idx[b]] = 1
    return out


def synthetic_flat(
    cfg: Config, n_songs: int = 3, windows_per_song: int = 4, seed: int = 0
) -> FlatSplit:
    """Random one-hot windows laid out as a FlatSplit."""
    rng = np.random.RandomState(seed)
    N = n_songs * windows_per_song
    T, Tin = cfg.output_length, cfg.input_length
    Y = onehot_seq(rng, N, T, cfg.output_dim)
    sid = np.repeat(np.arange(n_songs), windows_per_song).astype(np.int32)
    first = np.zeros(N, bool)
    first[::windows_per_song] = True
    labels = (sid % cfg.num_classes).astype(np.int32)
    C = np.eye(cfg.num_classes, dtype=np.float32)[labels]
    return FlatSplit(
        X=Y.copy() if Tin == T and cfg.input_dim == cfg.output_dim
        else onehot_seq(rng, N, Tin, cfg.input_dim),
        Y=Y,
        I=onehot_seq(rng, N, cfg.max_voices, cfg.instrument_dim),
        V=rng.rand(N, T, 1).astype(np.float32),
        D=onehot_seq(rng, N, T, 2),
        C=C,
        S=rng.randn(N, 15).astype(np.float32),
        song_id=sid,
        first_in_song=first,
        labels=labels,
    )

#!/usr/bin/env python
"""Batch-size throughput scaling of the device-resident training path.

The reference pins batch_size=256 (settings.py:110); bench.py measures that
geometry for parity. This tool measures the headroom past it: the same
4096-window dataset trained at global batch 256 -> 2048 (fewer, bigger
optimizer steps per epoch), reporting note-steps/s per config.

Methodology matches bench.py: whole epochs per device dispatch, and the
configs are INTERLEAVED round-robin with best-of taken per config, so the
shared dev chip's tenant time-slicing (which only ever adds time) cannot
bias the comparison.

Usage: python tools/bench_batch.py [--batches 256,512,1024,2048] [--rounds 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,512,1024,2048")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--epochs-per-call", type=int, default=10)
    args = ap.parse_args()

    from midi_vae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.parallel import make_mesh
    from midi_vae_tpu.training import VAETrainer
    from midi_vae_tpu.utils.synthetic import synthetic_flat

    batches = [int(b) for b in args.batches.split(",")]
    n_windows = 16 * 256  # the bench.py dataset size, fixed across configs

    runs = []
    for bs in batches:
        cfg = Config(batch_size=bs)
        mesh = make_mesh()
        tr = VAETrainer(cfg, mesh=mesh)
        st = tr.init_state(seed=0)
        flat = synthetic_flat(cfg, n_songs=64, windows_per_song=n_windows // 64)
        data = tr.prepare_device_data(flat)
        runs.append((bs, tr, st, data, flat.num_windows))

    # compile + warmup every config before any timing
    for bs, tr, st, data, nw in runs:
        tr.run_epochs_device(st, data, nw, args.epochs_per_call, shuffle=True)
        print(f"warm B={bs}", file=sys.stderr)

    best = {bs: float("inf") for bs in batches}
    for _ in range(args.rounds):
        for bs, tr, st, data, nw in runs:
            t0 = time.perf_counter()
            per_epoch = tr.run_epochs_device(
                st, data, nw, args.epochs_per_call, shuffle=True
            )
            dt = time.perf_counter() - t0
            assert len(per_epoch) == args.epochs_per_call
            best[bs] = min(best[bs], dt)

    note_steps = n_windows * 64 * args.epochs_per_call
    out = {
        "metric": "batch_scaling_note_steps_per_sec",
        "dataset_windows": n_windows,
        "epochs_per_call": args.epochs_per_call,
        "per_batch": {
            str(bs): round(note_steps / best[bs], 1) for bs in batches
        },
        "vs_b256": {
            str(bs): round(best[256] / best[bs], 3) for bs in batches
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root
    sys.exit(main())

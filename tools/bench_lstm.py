#!/usr/bin/env python
"""Benchmark the LSTM cell: fused Pallas kernels vs the plain XLA scan.

Measures the full jitted training step (fwd + bwd + Adam) at reference scale
(/root/reference/settings.py:108-140 geometry, LSTM cell per
/root/reference/vae_definition.py:528-533) with use_pallas on vs off.

Both configurations are set up first and their timing windows INTERLEAVED
(the chip is time-sliced with other tenants; sequential phases can land in
different contention regimes), reporting each configuration's best window.

Usage: python tools/bench_lstm.py [--batch 256] [--iters 15] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def setup(cfg):
    import numpy as np

    from midi_vae_tpu.parallel import make_mesh, shard_batch
    from midi_vae_tpu.parallel.mesh import pad_batch_to
    from midi_vae_tpu.training import VAETrainer
    from midi_vae_tpu.training.trainer import _slice_batch
    from midi_vae_tpu.utils.synthetic import synthetic_flat

    trainer = VAETrainer(cfg, mesh=make_mesh())
    state = trainer.init_state(seed=0)
    flat = synthetic_flat(cfg, n_songs=8, windows_per_song=cfg.batch_size // 8)
    batch = _slice_batch(flat, np.arange(cfg.batch_size), cfg, None)
    batch, mask = pad_batch_to(batch, cfg.batch_size)
    batch["M"] = mask
    batch = shard_batch(batch, trainer.mesh)
    return trainer, state, batch


def window(trainer, state, batch, iters: int) -> float:
    import jax

    t0 = time.perf_counter()
    for _ in range(iters):
        state.params, state.opt_state, state.rng, m = trainer.train_step(
            state.params, state.opt_state, batch, state.rng
        )
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax

    from midi_vae_tpu.config import Config

    rigs = {}
    for pallas in ("off", "on"):
        cfg = Config(cell_type="LSTM", batch_size=args.batch, use_pallas=pallas)
        rigs[pallas] = setup(cfg)
        # warmup / compile
        window(*rigs[pallas], iters=3)

    best = {k: float("inf") for k in rigs}
    for _ in range(args.reps):
        for k in rigs:
            best[k] = min(best[k], window(*rigs[k], iters=args.iters))

    n_chips = len(jax.devices())
    rates = {}
    for k, dt in best.items():
        rates[k] = args.batch * 64 / dt / n_chips
        print(
            json.dumps(
                {
                    "metric": f"lstm_train_note_steps_per_sec_per_chip_pallas_{k}",
                    "value": round(rates[k], 1),
                    "unit": "note-steps/s/chip",
                }
            ),
            flush=True,
        )
    speedup = rates["on"] / rates["off"]
    print(json.dumps({"metric": "lstm_pallas_speedup", "value": round(speedup, 3)}))
    if speedup < 1.0:
        sys.exit(1)


if __name__ == "__main__":
    main()

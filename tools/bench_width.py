#!/usr/bin/env python
"""Benchmark model-width scaling: fused kernels (wide two-pass dispatch)
vs the plain XLA scan, at lstm_size past the reference's 256.

For each (lstm_size, dtype) the full jitted training step (fwd + bwd + Adam)
runs with use_pallas on vs off, timing windows INTERLEAVED (the shared chip
is time-sliced by other tenants; sequential phases can land in different
contention regimes), best window reported.

At H>=512 f32 / H=1024 the encoder layers dispatch the wide two-pass
kernels (ops/fused_train.py: batch-tiled da_cat kernel + XLA weight-grad
matmuls); the decoder heads take the XLA scan where their in-place kernels
no longer fit VMEM.

Usage: python tools/bench_width.py [--sizes 512,1024] [--dtypes f32,bf16]
                                   [--batch 256] [--iters 10] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))  # repo root (midi_vae_tpu)
sys.path.insert(0, _TOOLS)                   # bench_lstm rig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,1024")
    ap.add_argument("--dtypes", default="f32")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax

    from midi_vae_tpu.config import Config

    from bench_lstm import setup, window  # same rig: full train_step A/B

    dtypes = {
        "f32": "float32",
        "bf16": "bfloat16",
    }
    n_chips = len(jax.devices())
    for size in (int(s) for s in args.sizes.split(",")):
        for dkey in args.dtypes.split(","):
            rigs = {}
            for pallas in ("off", "on"):
                cfg = Config(
                    batch_size=args.batch,
                    use_pallas=pallas,
                    lstm_size=size,
                    compute_dtype=dtypes[dkey],
                )
                rigs[pallas] = setup(cfg)
                window(*rigs[pallas], iters=2)  # warmup / compile

            best = {k: float("inf") for k in rigs}
            for _ in range(args.reps):
                for k in rigs:
                    best[k] = min(best[k], window(*rigs[k], iters=args.iters))

            rates = {
                k: args.batch * 64 / dt / n_chips for k, dt in best.items()
            }
            print(
                json.dumps(
                    {
                        "metric": "width_train_note_steps_per_sec_per_chip",
                        "lstm_size": size,
                        "dtype": dkey,
                        "xla_scan": round(rates["off"], 1),
                        "fused": round(rates["on"], 1),
                        "speedup": round(rates["on"] / rates["off"], 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()

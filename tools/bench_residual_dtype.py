#!/usr/bin/env python
"""A/B: decode-residual dtype (f32 vs bf16) in the multi-head decode kernel.

The multi-head decode train kernels stream three (T, B, H) hidden-state
sequences to HBM as backward residuals (h1seq/h2seq/hkseq -- at the
reference scale 3 x 16.8 MB written forward + read twice backward, ~151 MB
per optimizer step, the largest residual-only streams in the step).
Config.decode_residual_bf16 halves them without touching the forward
numerics (the forward carry stays f32 in VMEM scratch; probs/logits are
bit-equal -- tests/test_ops_train.py::test_bf16_residual_dtype).

This tool measures whether that bandwidth actually buys wall time on the
full jitted train step (fwd + bwd + Adam) at reference scale, interleaving
the two configurations' timing windows (the chip is time-sliced with other
tenants; sequential phases can land in different contention regimes), and
reports each configuration's best window plus the one-step loss delta from
identical initial state.

MEASURED RESULT (v5e, reference scale): perf-NEUTRAL. Device-op tracing
(tools/profile_step.py --set decode_residual_bf16=...) shows identical
kernel times (mh-bwd 576.3 vs 573.9 us/step; total 1.739 vs 1.738 ms) --
the step runs at ~35% of HBM bandwidth and is bound by serial per-step
kernel latency. One wall-clock run of this tool showed +22%; that was
tenant time-slicing noise -- trust the device-op A/B, and treat wall
numbers from this tool as environment-qualified. Recorded in PARITY.md
"measured dead ends"; the config default stays False (exact-f32 grads).

Usage: python tools/bench_residual_dtype.py [--batch 256] [--iters 15]
       [--reps 4] [--held-notes]
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


def one_step_loss(trainer, batch, seed: int) -> float:
    state = trainer.init_state(seed=seed)
    _, _, _, m = trainer.train_step(
        state.params, state.opt_state, batch, state.rng
    )
    return float(m["loss"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--held-notes", action="store_true",
                    help="also enable the held-notes head (dks=[1,2])")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="extra Config overrides (e.g. lstm_size=512) -- "
                         "the r5 HBM-bound-geometry A/B cells")
    args = ap.parse_args()

    from midi_vae_tpu.config import parse_overrides

    overrides = parse_overrides(getattr(args, "set"))
    if "decode_residual_bf16" in overrides:
        raise SystemExit(
            "decode_residual_bf16 is the A/B axis itself; do not --set it"
        )

    import jax

    from midi_vae_tpu.config import Config

    rigs, losses, cfgs = {}, {}, {}
    for name, flag in (("f32", False), ("bf16", True)):
        # --set wins over the dedicated flags (--batch / --held-notes)
        base = dict(batch_size=args.batch,
                    meta_held_notes=bool(args.held_notes),
                    decode_residual_bf16=flag)
        base.update(overrides)
        cfg = Config(**base)
        cfgs[name] = cfg
        rigs[name] = setup(cfg)
        window(*rigs[name], iters=3)  # warmup / compile
        losses[name] = one_step_loss(rigs[name][0], rigs[name][2], seed=7)

    best = {k: float("inf") for k in rigs}
    for _ in range(args.reps):
        for k in rigs:
            best[k] = min(best[k], window(*rigs[k], iters=args.iters))

    n_chips = len(jax.devices())
    rates = {}
    for k, dt in best.items():
        # note-steps from the ACTUAL config (--set may override geometry)
        rates[k] = cfgs[k].batch_size * cfgs[k].output_length / dt / n_chips
        print(
            json.dumps(
                {
                    "metric": f"train_note_steps_per_sec_per_chip_residual_{k}",
                    "value": round(rates[k], 1),
                    "unit": "note-steps/s/chip",
                    "ms_per_step": round(best[k] * 1e3, 3),
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "metric": "residual_bf16_speedup",
                "value": round(rates["bf16"] / rates["f32"], 4),
                "loss_f32": round(losses["f32"], 6),
                "loss_bf16": round(losses["bf16"], 6),
                "loss_rel_delta": round(
                    abs(losses["bf16"] - losses["f32"])
                    / max(abs(losses["f32"]), 1e-12), 8,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""TPU config-matrix soak: short REAL-CHIP training runs across the config
space the CPU test suite cannot cover.

The CPU suite runs every model path through the jnp fallbacks -- it cannot
catch Mosaic/Pallas lowering failures, which only appear when a config's
dispatch gates put it on a real TPU kernel at reference scale (e.g. the
round-2 bf16 narrow-head 'vector.broadcast' crash: every CPU test passed).
This tool trains each config for a few epochs at reference scale on the
actual chip and requires finite, decreasing loss.

Usage:  python tools/tpu_soak.py [--epochs 12] [--only NAME]
Prints one PASS/FAIL line per config and exits nonzero on any failure.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

CONFIGS: dict[str, dict] = {
    "default_f32": {},
    "bf16": {"compute_dtype": "bfloat16"},
    "lstm": {"cell_type": "LSTM"},
    "lstm_bf16": {"cell_type": "LSTM", "compute_dtype": "bfloat16"},
    "simple_rnn": {"cell_type": "SimpleRNN"},
    "bidirectional": {"bidirectional": True},
    "teacher_force": {"teacher_force": True},
    "merge_decoder_scans": {"merge_decoder_scans": True},
    "held_notes": {"meta_held_notes": True},
    "next_notes_additional": {
        "meta_next_notes": True,
        "decoder_input_composer": True,
    },
    "embedding": {"use_embedding": True, "embedding_dim": 32},
    # bf16 across the alternative decode paths (the GRU per-step kernels'
    # custom VJPs only run under these combinations)
    "merge_bf16": {
        "merge_decoder_scans": True,
        "compute_dtype": "bfloat16",
    },
    "held_bf16": {"meta_held_notes": True, "compute_dtype": "bfloat16"},
    # bf16 h-seq residual streams in the multi-head decode kernels
    # (backward-only narrowing; forward bit-equal -- config.py)
    "residual_bf16": {"decode_residual_bf16": True},
    "held_residual_bf16": {
        "meta_held_notes": True,
        "decode_residual_bf16": True,
    },
    "teacher_force_bf16": {
        "teacher_force": True,
        "compute_dtype": "bfloat16",
    },
    # width scaling: H=512 falls back to the XLA scan in f32 (whole-layer
    # kernels out of VMEM budget) but keeps the xp-streaming train kernels
    # under bf16 (dtype-aware budgets) -- both must train
    "wide512": {"lstm_size": 512},
    "wide512_bf16": {"lstm_size": 512, "compute_dtype": "bfloat16"},
    "no_history": {"history": False},
    "encode_pass_history": {"history_from_train_z": False},
    "no_fused_train": {
        "fused_train_encoder": False,
        "fused_train_decoder": False,
    },
    "single_layer": {"num_layers_encoder": 1, "num_layers_decoder": 1},
    # Keras-2.0.8-exact optimizer update rules (training/keras_optim.py)
    "adam_keras": {"optimizer": "adam_keras"},
    "rmsprop_keras": {"optimizer": "rmsprop_keras"},
    # Keras-2.0.8 hard_sigmoid gates force the scan path on TPU too
    "hard_sigmoid": {"gate_activation": "hard_sigmoid"},
}


def run_one(name: str, overrides: dict, epochs: int) -> tuple[bool, str]:
    import jax

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.parallel import make_mesh
    from midi_vae_tpu.training import VAETrainer
    from midi_vae_tpu.utils.synthetic import synthetic_flat

    cfg = Config(**overrides)
    trainer = VAETrainer(cfg, mesh=make_mesh())
    state = trainer.init_state(seed=0)
    flat = synthetic_flat(cfg, n_songs=16, windows_per_song=4 * cfg.batch_size // 16)
    t0 = time.time()
    if trainer.supports_device_epoch():
        data = trainer.prepare_device_data(flat)
        per_epoch = trainer.run_epochs_device(
            state, data, flat.num_windows, epochs, shuffle=True
        )
    else:
        per_epoch = []
        for _ in range(epochs):
            per_epoch.append(trainer.run_epoch(state, flat).means())
    first, last = per_epoch[0]["loss"], per_epoch[-1]["loss"]
    dt = time.time() - t0
    import math

    ok = all(
        math.isfinite(v) for m in per_epoch for v in m.values()
    ) and last < first
    return ok, f"loss {first:.3f} -> {last:.3f} in {dt:.0f}s ({epochs} epochs)"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    names = [args.only] if args.only else list(CONFIGS)
    failures = []
    for name in names:
        try:
            ok, msg = run_one(name, CONFIGS[name], args.epochs)
        except Exception as e:  # a lowering crash is exactly what we hunt
            ok, msg = False, f"{type(e).__name__}: {str(e)[:200]}"
        print(f"{'PASS' if ok else 'FAIL'}  {name:24s} {msg}", flush=True)
        if not ok:
            failures.append(name)
    if failures:
        sys.exit(f"FAILED configs: {', '.join(failures)}")
    print(f"all {len(names)} configs pass on {__import__('jax').default_backend()}")


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    main()

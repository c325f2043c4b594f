#!/usr/bin/env python
"""Benchmark: VAE training throughput in note-steps/sec/chip.

Measures the framework's PRODUCTION training path -- the device-resident
multi-epoch driver (``VAETrainer.run_epochs_device``: whole epochs per
device dispatch, history pass + shuffle + optimizer scan inside one jitted
program; this is what ``train.py`` runs) -- at reference scale: GRU(256)x2
encoder/decoder, latent 256, batch 256 windows x 64 unrolled note-steps
(settings.py:108-140 of the reference). Prints ONE JSON line:

    {"metric": "vae_train_note_steps_per_sec_per_chip", "value": N,
     "unit": "note-steps/s/chip", "vs_baseline": N / 50000.0}

Methodology: the dataset (4096 windows) is uploaded once; each timed window
runs E=10 full epochs in one device call. Per-dispatch overhead of the dev
environment's tunneled TPU (a ~5 ms floor per host->device call, unrelated
to the chip) is amortized away exactly as it is in real training. The BEST
of 21 timing windows is reported, taken as 3 groups of 7 separated by 5 s
pauses: the shared chip is time-sliced with other tenants in episodes that
can outlast a single back-to-back group, so spreading the windows over
~30 s gives each measurement a chance to land in a quiet slice —
interference only ever adds time, so max-throughput-over-windows is the
estimator that converges on the chip's true rate.

Baseline: the driver north-star of >= 50k note-steps/sec/chip
(/root/repo/BASELINE.json); the reference publishes no numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time


def main_e2e(epochs: int, songs_per_style: int) -> None:
    """--e2e: wall-to-wall training throughput at the REFERENCE cadence.

    Measures what a migrating user gets from ``train.py``: MIDI corpus on
    disk -> import + tensorize -> device-resident training with
    test_step=1 (evaluate the whole test split EVERY epoch,
    vae_training.py:963) and save_step=10 (full checkpoint incl. optimizer
    state every 10 epochs) -> final checkpoint + history. Reports sustained
    note-steps/s/chip over the fit() wall clock (the VERDICT r2 "e2e cliff"
    metric) plus a where-the-time-goes breakdown; corpus generation+import
    are timed separately (one-time costs a real run amortizes).
    """
    import shutil
    import subprocess
    import sys
    import tempfile

    from midi_vae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.data.batching import flatten_dataset
    from midi_vae_tpu.data.dataset import import_midi_from_folder
    from midi_vae_tpu.training import VAETrainer

    corpus = f"/tmp/bench_e2e_corpus_{songs_per_style}"
    if not os.path.isdir(corpus):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "make_demo_corpus.py"),
             corpus, "--songs-per-style", str(songs_per_style), "--chords"],
            check=True, capture_output=True,
        )

    cfg = Config()  # reference cadence: test_step=1, save_step=10
    t0 = time.perf_counter()
    ds = import_midi_from_folder(corpus, cfg, verbose=False)
    train, test, _, _ = flatten_dataset(ds, cfg)
    t_import = time.perf_counter() - t0

    trainer = VAETrainer(cfg)
    t0 = time.perf_counter()
    state = trainer.init_state(seed=0)
    t_init = time.perf_counter() - t0

    out_dir = tempfile.mkdtemp(prefix="bench_e2e_run_")
    try:
        # warmup run compiles every chunk-shape program (cached on disk for
        # later invocations); the timed run measures steady-state wall time
        # 20 warmup epochs hit every chunk-shape the timed run uses when
        # epochs % 10 == 0: E=1 (epoch 0), E=10 (cadence), E=9 (final)
        warm = trainer.init_state(seed=1)
        trainer.fit(warm, train, test=test, epochs=min(20, epochs),
                    output_dir=os.path.join(out_dir, "warm"),
                    log_fn=lambda s: None, plot=False)
        state.epoch = 0
        t0 = time.perf_counter()
        trainer.fit(state, train, test=test, epochs=epochs,
                    output_dir=os.path.join(out_dir, "run"),
                    log_fn=lambda s: None, plot=False)
        t_fit = time.perf_counter() - t0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    n_chips = len(jax.devices())
    note_steps = epochs * train.num_windows * cfg.output_length
    per_chip = note_steps / t_fit / n_chips
    timings = getattr(trainer, "last_fit_timings", {})
    print(
        json.dumps(
            {
                "metric": "vae_train_note_steps_per_sec_e2e",
                "value": round(per_chip, 1),
                "unit": "note-steps/s/chip",
                "vs_baseline": round(per_chip / 50_000.0, 4),
                "epochs": epochs,
                "train_windows": train.num_windows,
                "test_windows": test.num_windows,
                "fit_s": round(t_fit, 2),
                "import_s": round(t_import, 2),
                "init_s": round(t_init, 2),
                "incl_import_and_init": round(
                    note_steps / (t_fit + t_import + t_init) / n_chips, 1
                ),
                "breakdown": {k: (round(v, 2) if isinstance(v, float) else v)
                              for k, v in timings.items()},
            }
        )
    )


def main() -> None:
    from midi_vae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.parallel import make_mesh
    from midi_vae_tpu.training import VAETrainer
    from midi_vae_tpu.utils.synthetic import synthetic_flat

    n_chips = len(jax.devices())
    cfg = Config(batch_size=256 * n_chips)
    mesh = make_mesh()
    trainer = VAETrainer(cfg, mesh=mesh)
    state = trainer.init_state(seed=0)

    n_windows = 16 * cfg.batch_size  # 16 optimizer steps per epoch
    flat = synthetic_flat(cfg, n_songs=64, windows_per_song=n_windows // 64)
    data = trainer.prepare_device_data(flat)

    epochs_per_call = 10

    def one_call():
        return trainer.run_epochs_device(
            state, data, flat.num_windows, epochs_per_call, shuffle=True
        )

    one_call()  # compile + warmup
    times = []
    for group in range(3):
        if group:
            time.sleep(5.0)  # let a contended time-slice episode pass
        for _ in range(7):
            t0 = time.perf_counter()
            per_epoch = one_call()
            # run_epochs_device fetches metrics eagerly; the state is updated
            # in place and metrics are host-side -> the call is synchronous
            assert len(per_epoch) == epochs_per_call
            times.append(time.perf_counter() - t0)
    dt = min(times)

    note_steps = flat.num_windows * cfg.output_length * epochs_per_call
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
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--e2e", action="store_true",
                   help="wall-to-wall train.py throughput at reference cadence")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--songs-per-style", type=int, default=60)
    a = p.parse_args()
    if a.e2e:
        main_e2e(a.epochs, a.songs_per_style)
    else:
        main()

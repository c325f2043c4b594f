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
import time


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
    main()

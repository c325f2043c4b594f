#!/usr/bin/env python
"""Train the MIDI-VAE on a labeled MIDI corpus.

CLI replacement for the reference's ``python vae_training.py`` (which had no
arguments -- all behavior came from editing settings.py). Example:

    python train.py --source data/original --output runs/jvp \\
        --classes Jazz,Pop --epochs 400 --set beta=0.1 --set lstm_size=256

Resume:  python train.py --source data/original --output runs/jvp --resume
"""

from __future__ import annotations

import argparse
import sys

from ..config import parse_overrides

__all__ = ["main", "parse_overrides"]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="MIDI corpus folder")
    p.add_argument("--output", required=True, help="run/checkpoint directory")
    p.add_argument("--classes", default=None, help="comma-separated style labels")
    p.add_argument("--config", default=None, help="config JSON to start from")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--cache", default=None, help="dataset cache directory")
    p.add_argument("--workers", type=int, default=0, help="parallel import workers")
    p.add_argument("--resume", action="store_true", help="resume from --output")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="override any Config field")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--profile", default=None, metavar="LOGDIR",
                   help="capture a jax.profiler trace of the first epoch")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)

    if args.coordinator:
        from midi_vae_tpu.parallel import distributed as dist

        dist.initialize(args.coordinator, args.num_processes, args.process_id)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from midi_vae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.data.batching import flatten_dataset
    from midi_vae_tpu.data.dataset import import_midi_from_folder
    from midi_vae_tpu.training import VAETrainer

    import os

    run_config = os.path.join(args.output, "config.json")
    if args.config:
        cfg = Config.load(args.config)
    elif args.resume and os.path.exists(run_config):
        # resume under the run's SAVED hyperparameters (a fresh Config()
        # would rebuild the trainer with wrong shapes or silently change
        # the run); explicit --set/--classes/--epochs still override
        cfg = Config.load(run_config)
        print(f"resuming with {run_config}")
    else:
        cfg = Config()
    overrides = parse_overrides(args.set)
    if args.classes:
        overrides["classes"] = tuple(args.classes.split(","))
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if overrides:
        cfg = cfg.replace(**overrides)

    print(f"importing corpus from {args.source} ...")
    ds = import_midi_from_folder(args.source, cfg, cache_dir=args.cache, verbose=True, workers=args.workers)
    print(f"train songs: {ds.train_set_size}  test songs: {ds.test_set_size}")
    if ds.train_set_size == 0:
        print("no songs imported -- check --source and --classes")
        return 1
    train, test, sig_mean, sig_std = flatten_dataset(ds, cfg)
    print(f"train windows: {train.num_windows}  test windows: {test.num_windows}")

    trainer = VAETrainer(cfg)
    print(f"mesh: {dict(trainer.mesh.shape)}")
    if args.resume:
        state = trainer.restore(args.output)
        print(f"resumed from epoch {state.epoch}")
    else:
        state = trainer.init_state()

    import numpy as np
    import os

    os.makedirs(args.output, exist_ok=True)
    np.savez(
        os.path.join(args.output, "signature_stats.npz"),
        mean=sig_mean,
        std=sig_std,
    )
    if args.profile:
        from midi_vae_tpu.utils.profiling import trace

        with trace(args.profile):
            trainer.fit(state, train, test=test, epochs=state.epoch + 1,
                        output_dir=args.output)
        print(f"profiler trace written to {args.profile}")
        if cfg.epochs <= state.epoch:
            return 0
    trainer.fit(state, train, test=test, output_dir=args.output)
    return 0





if __name__ == "__main__":
    sys.exit(main())

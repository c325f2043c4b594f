#!/usr/bin/env python
"""Train the style classifiers (judges for style-transfer evaluation).

CLI replacement for the reference's pitch_classifier.py /
velocity_classifier.py / instrument_classifier.py scripts. Examples:

    python classify.py --source data/original --output runs/clf \\
        --classes Jazz,Pop --kinds pitch,velocity,instrument --epochs 30

Each kind is saved under <output>/<kind>/ with checkpoints, history.json,
spec.json and confusion-matrix plots.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--classes", default=None)
    p.add_argument("--kinds", default="pitch,velocity,instrument")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--cache", default=None)
    p.add_argument("--workers", type=int, default=0, help="parallel import workers")
    p.add_argument("--lstm-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--learning-rate", type=float, default=None,
                   help="override the per-kind reference defaults "
                        "(pitch/velocity 2e-5, instrument 1e-5)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from midi_vae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.data.batching import flatten_dataset
    from midi_vae_tpu.data.dataset import import_midi_from_folder
    from midi_vae_tpu.models.classifier import ClassifierSpec
    from midi_vae_tpu.training.classifier_trainer import (
        ClassifierTrainer,
        classifier_arrays,
    )

    cfg = Config()
    if args.classes:
        cfg = cfg.replace(classes=tuple(args.classes.split(",")))

    print(f"importing corpus from {args.source} ...")
    ds = import_midi_from_folder(args.source, cfg, cache_dir=args.cache, workers=args.workers)
    print(f"train songs: {ds.train_set_size}  test songs: {ds.test_set_size}")
    train, test, _, _ = flatten_dataset(ds, cfg)

    for kind in args.kinds.split(","):
        kind = kind.strip()
        overrides = dict(lstm_size=args.lstm_size, batch_size=args.batch_size)
        if args.learning_rate is not None:
            overrides["learning_rate"] = args.learning_rate
        spec = ClassifierSpec.for_kind(kind, cfg, **overrides)
        trainer = ClassifierTrainer(spec)
        state = trainer.init_state()
        tr_x, tr_c = classifier_arrays(train, kind)
        te_x, te_c = classifier_arrays(test, kind)
        print(f"[{kind}] train samples: {len(tr_x)}  test samples: {len(te_x)}")
        trainer.fit(
            state,
            tr_x,
            tr_c,
            te_x,
            te_c,
            epochs=args.epochs,
            output_dir=os.path.join(args.output, kind),
            class_names=list(cfg.classes),
        )
    return 0





if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Run the evaluation/generation harness on a trained model.

CLI replacement for the reference's ``python vae_evaluation.py``. Example:

    python evaluate.py --source data/original --model runs/jvp \\
        --classifiers runs/clf --output eval/jvp \\
        --sections autoencoding,latent_sweep,chords

Sections: stats (always), harmonicity, medleys, random_interpolations,
latent_sweep, chords, sampling_regions, pitches, random_songs, long_songs,
autoencoding. Default: autoencoding.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="MIDI corpus folder")
    p.add_argument("--model", required=True, help="VAE run dir (train.py --output)")
    p.add_argument("--epoch", type=int, default=None, help="checkpoint epoch")
    p.add_argument("--classifiers", default=None,
                   help="classifier run dir (classify.py --output)")
    p.add_argument("--output", required=True)
    p.add_argument("--cache", default=None)
    p.add_argument("--workers", type=int, default=0, help="parallel import workers")
    p.add_argument("--sections", default="autoencoding")
    p.add_argument("--test-train-set", action="store_true")
    p.add_argument("--num-songs", type=int, default=3,
                   help="count for generation sections")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from midi_vae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from midi_vae_tpu.data.dataset import import_midi_from_folder
    from midi_vae_tpu.evaluation import EvalSections, Evaluator
    from midi_vae_tpu.training import checkpoint as ckpt
    from midi_vae_tpu.training.classifier_trainer import load_classifier

    cfg = ckpt.load_config(args.model)
    print(f"importing corpus from {args.source} ...")
    ds = import_midi_from_folder(args.source, cfg, cache_dir=args.cache, workers=args.workers)
    print(f"train songs: {ds.train_set_size}  test songs: {ds.test_set_size}")

    state = ckpt.restore_vae_state(args.model, args.epoch)
    print(f"restored model at epoch {state['epoch']}")

    classifiers = {}
    if args.classifiers:
        for kind in ("pitch", "velocity", "instrument"):
            path = os.path.join(args.classifiers, kind)
            if os.path.isdir(path):
                classifiers[kind] = load_classifier(path)
                print(f"loaded {kind} classifier")

    wanted = {s.strip() for s in args.sections.split(",")}
    known = {
        "stats", "harmonicity", "medleys", "random_interpolations",
        "latent_sweep", "chords", "sampling_regions", "pitches",
        "random_songs", "long_songs", "autoencoding",
    }
    unknown = wanted - known
    if unknown:
        raise SystemExit(
            f"unknown --sections {sorted(unknown)}; choose from {sorted(known)}"
        )
    n = args.num_songs
    sections = EvalSections(
        harmonicity_evaluations="harmonicity" in wanted,
        frankenstein_harmonicity_evaluations="harmonicity" in wanted,
        max_new_chosen_interpolation_songs=n if "medleys" in wanted else 0,
        max_new_sampled_interpolation_songs=n if "random_interpolations" in wanted else 0,
        latent_sweep="latent_sweep" in wanted,
        chord_evaluation="chords" in wanted,
        evaluate_different_sampling_regions="sampling_regions" in wanted,
        pitch_evaluation="pitches" in wanted,
        max_new_sampled_songs=n if "random_songs" in wanted else 0,
        max_new_sampled_long_songs=n if "long_songs" in wanted else 0,
        evaluate_autoencoding_and_stuff="autoencoding" in wanted,
    )

    evaluator = Evaluator(
        cfg, state["params"], ds, args.output,
        classifiers=classifiers, test_train_set=args.test_train_set,
        seed=args.seed,
    )
    results = evaluator.run(sections)
    print(f"\nwrote artifacts to {args.output}")
    if "mean_reconstruction_accuracy" in results:
        print(
            "mean pitch reconstruction accuracy:",
            results["mean_reconstruction_accuracy"],
        )
    return 0





if __name__ == "__main__":
    sys.exit(main())

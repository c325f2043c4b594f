#!/usr/bin/env python
"""Export a trained run as a sealed serving bundle (see
midi_vae_tpu/serving.py): AOT-compiled encode / decode_argmax /
style_transfer programs with the weights baked in, loadable with nothing
but jax.

    python tools/export_serving.py --model runs/jvp --out bundles/jvp \\
        [--batch 8 64 256] [--epoch N] [--platforms tpu] [--cpu]

Each --batch value becomes a compiled bucket; the loader auto-pads any
request to the smallest adequate bucket.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, help="framework run dir")
    ap.add_argument("--out", required=True, help="bundle output dir")
    ap.add_argument("--batch", type=int, nargs="+", default=[256],
                    help="batch bucket size(s)")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--platforms", nargs="+", default=None,
                    help="lowering platforms (default: current backend)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on host CPU (skip TPU init)")
    ap.add_argument("--classifiers", default=None,
                    help="classifier run dir (classify.py --output): also "
                         "seal the pitch/velocity/instrument judges into "
                         "the bundle, so transfer --bundle judges from "
                         "sealed programs alone")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from midi_vae_tpu.serving import export_serving_bundle
    from midi_vae_tpu.training import checkpoint as ckpt

    cfg = ckpt.load_config(args.model)
    state = ckpt.restore_vae_state(args.model, args.epoch)
    manifest = export_serving_bundle(
        cfg, state["params"], args.out,
        batch_size=args.batch, platforms=args.platforms,
    )
    # signature-conditioned runs keep their train-time normalization stats
    # next to the programs so `transfer --bundle` can normalize inputs
    stats = os.path.join(args.model, "signature_stats.npz")
    if os.path.exists(stats):
        import shutil

        shutil.copy(stats, os.path.join(args.out, "signature_stats.npz"))
    if args.classifiers:
        from midi_vae_tpu.serving import export_classifier_judges
        from midi_vae_tpu.training.classifier_trainer import load_classifier

        judges = {}
        for kind in ("pitch", "velocity", "instrument"):
            kind_dir = os.path.join(args.classifiers, kind)
            if os.path.isdir(kind_dir):
                judges[kind] = load_classifier(kind_dir)
        if not judges:
            raise SystemExit(
                f"no classifier run dirs under {args.classifiers!r} "
                "(expected pitch/ velocity/ instrument/)"
            )
        manifest = export_classifier_judges(
            judges, args.out, batch_size=args.batch,
            platforms=args.platforms,
        )
    print(json.dumps({"bundle": os.path.abspath(args.out), **manifest}))


if __name__ == "__main__":
    main()

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
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from midi_vae_tpu.serving import export_serving_bundle
    from midi_vae_tpu.training import checkpoint as ckpt

    cfg = ckpt.load_config(args.model)
    state = ckpt.restore_checkpoint(args.model, args.epoch)
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
    print(json.dumps({"bundle": os.path.abspath(args.out), **manifest}))


if __name__ == "__main__":
    main()

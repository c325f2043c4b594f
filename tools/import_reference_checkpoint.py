#!/usr/bin/env python
"""Import a reference (brunnergino/MIDI-VAE) Keras checkpoint -- or export
one -- so trained models move across the migration in both directions.

The reference saves ``model.save_weights`` HDF5 files every save_step
epochs (vae_training.py:966-978: autoencoderEpochN / encoderEpochN /
decoderEpochN, '.pickle' extension, HDF5 content) next to a ``params.txt``
hyperparameter dump (:578-654). This tool converts those into a framework
run directory (config.json + orbax checkpoint) usable by evaluate.py /
generate.py / transfer.py / ``train.py --resume``:

  python tools/import_reference_checkpoint.py \\
      --weights .../autoencoderEpoch600.pickle \\
      --params-txt .../params.txt --classes Bach Mozart \\
      --out runs/imported_bvm

and back -- export a framework checkpoint in the reference's on-disk
layout (load with ``load_weights(..., by_name=True)``):

  python tools/import_reference_checkpoint.py --export \\
      --checkpoint runs/my_run --out /tmp/keras_ckpt

Notes: ``save_weights`` files carry no optimizer state, so imported runs
get a freshly initialized optimizer -- exactly what the reference's own
resume does (vae_training.py:121-127). Mapping caveats (bidirectional,
recurrentshop internals, --name-map) are documented in
midi_vae_tpu/utils/keras_h5.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def do_import(args) -> None:
    import jax
    import numpy as np

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.models.vae import MidiVAE
    from midi_vae_tpu.training import checkpoint as ckpt
    from midi_vae_tpu.utils import keras_h5

    if args.params_txt:
        if not args.classes:
            sys.exit(
                "--classes is required with --params-txt (the reference "
                "records class names only in settings.py, never in "
                "params.txt)"
            )
        cfg = keras_h5.config_from_params_txt(
            args.params_txt, classes=args.classes
        )
    elif args.config:
        cfg = Config.load(args.config)
    else:
        sys.exit("one of --params-txt or --config is required")

    name_map = None
    if args.name_map:
        with open(args.name_map) as f:
            name_map = json.load(f)

    weights = keras_h5.read_weights_h5(args.weights)
    model = MidiVAE(cfg)
    template = model.init_params(jax.random.PRNGKey(cfg.seed))
    params = keras_h5.params_from_weights(
        weights, cfg, template, name_map=name_map, strict=not args.partial
    )
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), params
    )

    epoch = args.epoch
    if epoch is None:
        for p in args.weights:
            epoch = keras_h5.epoch_from_filename(p)
            if epoch is not None:
                break
        epoch = epoch or 0

    # a fresh optimizer + rng, exactly like the reference's own resume
    # (vae_training.py:121-127 reloads weights only)
    from midi_vae_tpu.training import VAETrainer

    state = VAETrainer(cfg).init_state(seed=cfg.seed)
    path = ckpt.save_checkpoint(
        args.out, epoch, params, state.opt_state, state.rng, cfg
    )
    n = len(jax.tree_util.tree_leaves(params))
    print(
        json.dumps(
            {
                "imported": path,
                "epoch": epoch,
                "param_leaves": n,
                "variables": len(weights),
            }
        )
    )


def do_import_classifier(args) -> None:
    """Import one of the reference's style-classifier checkpoints
    (pitch/velocity/instrument_classifier.py save model.save_weights as
    '<kind>_classifier_epoch_N.pickle') into a classifier run dir
    (spec.json + orbax checkpoint) that evaluate.py --classifiers and
    midi_vae_tpu.training.load_classifier accept."""
    import jax
    import numpy as np

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.models.classifier import ClassifierSpec
    from midi_vae_tpu.training import checkpoint as ckpt
    from midi_vae_tpu.training.classifier_trainer import ClassifierTrainer
    from midi_vae_tpu.utils import keras_h5

    if args.params_txt:
        if not args.classes:
            sys.exit("--classes is required with --params-txt")
        cfg = keras_h5.config_from_params_txt(
            args.params_txt, classes=args.classes
        )
    elif args.config:
        cfg = Config.load(args.config)
    elif args.classes:
        cfg = Config(classes=tuple(args.classes),
                     gate_activation="hard_sigmoid")
    else:
        sys.exit("one of --params-txt/--config/--classes is required")

    # the reference judges trained under Keras-2.0.8 hard_sigmoid gates;
    # their geometry is fixed in the classifier scripts, not params.txt
    # (pitch_classifier.py:39,50: lstm_size 256, num_layers 2)
    spec = ClassifierSpec.for_kind(
        args.classifier, cfg, gate_activation=cfg.gate_activation,
        lstm_size=args.clf_lstm_size, num_layers=args.clf_num_layers,
    )
    trainer = ClassifierTrainer(spec)
    template = trainer.init_state()

    name_map = None
    if args.name_map:
        with open(args.name_map) as f:
            name_map = json.load(f)
    weights = keras_h5.read_weights_h5(args.weights)
    params = keras_h5.classifier_params_from_weights(
        weights, spec.cell_type, spec.num_layers, template.params,
        name_map=name_map, strict=not args.partial,
    )
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), params
    )

    epoch = args.epoch
    if epoch is None:
        for p in args.weights:
            epoch = keras_h5.epoch_from_filename(p)
            if epoch is not None:
                break
        epoch = epoch or 0

    os.makedirs(args.out, exist_ok=True)
    path = ckpt.save_checkpoint(
        args.out, epoch, params, template.opt_state, template.rng, None
    )
    with open(os.path.join(args.out, "spec.json"), "w") as f:
        json.dump(spec.__dict__, f, indent=2)
    print(
        json.dumps(
            {
                "imported": path,
                "kind": args.classifier,
                "epoch": epoch,
                "variables": len(weights),
            }
        )
    )


def do_export(args) -> None:
    from midi_vae_tpu.training import checkpoint as ckpt
    from midi_vae_tpu.utils import keras_h5

    cfg = ckpt.load_config(args.checkpoint)
    state = ckpt.restore_checkpoint(args.checkpoint, args.epoch)
    epoch = state["epoch"]
    schedule = keras_h5.vae_weight_schedule(cfg)
    os.makedirs(args.out, exist_ok=True)
    written = []
    for model_kind in ("autoencoder", "encoder", "decoder"):
        path = os.path.join(args.out, f"{model_kind}Epoch{epoch}.pickle")
        keras_h5.write_weights_h5(
            path, schedule, state["params"], model=model_kind
        )
        written.append(path)
    cfg.save(os.path.join(args.out, "config.json"))
    print(json.dumps({"exported": written, "epoch": epoch}))


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--export", action="store_true",
                    help="framework checkpoint -> Keras save_weights files")
    ap.add_argument("--weights", nargs="+", default=[],
                    help="reference save_weights file(s): autoencoder, or "
                         "encoder+decoder (import mode)")
    ap.add_argument("--params-txt", help="the run's params.txt dump")
    ap.add_argument("--config", help="framework config.json (alternative "
                                     "to --params-txt)")
    ap.add_argument("--classes", nargs="+",
                    help="style class names (required with --params-txt)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--epoch", type=int, default=None,
                    help="epoch number (default: parsed from the filename)")
    ap.add_argument("--checkpoint", help="framework run dir (export mode)")
    ap.add_argument("--classifier", choices=["pitch", "velocity",
                                             "instrument"],
                    help="import a style-classifier checkpoint of this "
                         "kind instead of the VAE")
    ap.add_argument("--clf-lstm-size", type=int, default=256,
                    help="classifier hidden size (pitch_classifier.py:39)")
    ap.add_argument("--clf-num-layers", type=int, default=2,
                    help="classifier layer count (pitch_classifier.py:50)")
    ap.add_argument("--name-map",
                    help="JSON {expected_variable_name: actual} remap for "
                         "artifacts whose internal names deviate")
    ap.add_argument("--partial", action="store_true",
                    help="fill what the file provides and ignore the rest "
                         "(e.g. importing only the encoder file)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on host CPU (skip TPU init)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.export:
        if not args.checkpoint:
            sys.exit("--export requires --checkpoint")
        do_export(args)
    else:
        if not args.weights:
            sys.exit("import requires --weights")
        if args.classifier:
            do_import_classifier(args)
        else:
            do_import(args)


if __name__ == "__main__":
    main()

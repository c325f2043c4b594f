#!/usr/bin/env python
"""Style-transfer a MIDI file with a trained MIDI-VAE checkpoint.

Standalone CLI for the product the reference buries inside its evaluation
script (vae_evaluation.py:2448-2625): tensorize a song, encode it, swap the
style dimensions z[C] <-> z[C_switch] that the composer latent probe pins
(vae_definition.py:730-734), decode, and write the transferred MIDI. Runs
the whole encode -> swap -> decode round trip as ONE device program
(``GenerationContext.style_transfer_song``).

Examples:
    python transfer.py --model runs/jvp --input song.mid \\
        --to-class pop --output out/
    python transfer.py --model runs/jvp --input song.mid \\
        --from-class jazz --to-class pop --output out/ --write-reconstruction \\
        --classifiers runs/clf   # judge the result: per-judge target-class
                                 # confidence for original vs transferred
"""

from __future__ import annotations

import argparse
import os
import sys


def _class_index(cfg, value: str, flag: str) -> int:
    """Accept a class name (case-insensitive, like the dataset labeling
    rule), or an integer index."""
    lowered = [c.lower() for c in cfg.classes]
    if value.lower() in lowered:
        return lowered.index(value.lower())
    try:
        idx = int(value)
    except ValueError:
        raise SystemExit(
            f"{flag}: {value!r} is not one of {list(cfg.classes)} or an index"
        )
    if not 0 <= idx < len(cfg.classes):
        raise SystemExit(f"{flag}: index {idx} out of range for {list(cfg.classes)}")
    return idx


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default=None, help="VAE run dir (train.py --output)")
    p.add_argument(
        "--bundle", default=None,
        help="sealed serving-bundle dir (tools/export_serving.py): run the "
             "transfer from the AOT-exported programs alone -- no model "
             "build, no checkpoint restore (mutually exclusive with --model)",
    )
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--input", required=True, nargs="+", help="MIDI file(s)")
    p.add_argument("--output", required=True, help="output folder")
    p.add_argument(
        "--to-class", required=True,
        help="target style: class name or index (z[C] <-> z[C_switch] swap)",
    )
    p.add_argument(
        "--from-class", default=None,
        help="source style; default: substring match of class names against "
             "the input path (the dataset-labeling rule), else class 0",
    )
    p.add_argument(
        "--write-reconstruction", action="store_true",
        help="also write the un-switched autoencoding for comparison",
    )
    p.add_argument(
        "--classifiers", default=None,
        help="classifier run dir (classify.py --output): judge the "
             "transferred song and report per-judge target-class confidence",
    )
    p.add_argument("--bpm", type=float, default=None,
                   help="output tempo (default: the input's steady-span tempo)")
    p.add_argument("--keep-instruments", action="store_true",
                   help="render with the INPUT's programs instead of the "
                        "predicted (voted) instruments")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from midi_vae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from midi_vae_tpu.data.tensorize import (
        instrument_matrix_to_programs,
        load_rolls_from_path,
        save_rolls_as_midi,
    )
    from midi_vae_tpu.evaluation.generation import vote_for_programs

    if (args.model is None) == (args.bundle is None):
        raise SystemExit("pass exactly one of --model or --bundle")
    if args.bundle is not None:
        # sealed-artifact path: the compiled programs + config are the whole
        # deployment -- no model classes, no checkpoint handling
        from midi_vae_tpu.serving import load_serving_bundle

        ctx = load_serving_bundle(args.bundle)
        cfg = ctx.cfg
        run_dir = args.bundle
        if args.epoch is not None:
            raise SystemExit("--epoch applies to --model runs, not bundles")
    else:
        from midi_vae_tpu.evaluation.generation import GenerationContext
        from midi_vae_tpu.models import MidiVAE
        from midi_vae_tpu.training import checkpoint as ckpt

        cfg = ckpt.load_config(args.model)
        state = ckpt.restore_vae_state(args.model, args.epoch)
        model = MidiVAE(cfg)
        ctx = GenerationContext(cfg, model, state["params"])
        run_dir = args.model
    os.makedirs(args.output, exist_ok=True)

    judges = {}
    if args.classifiers:
        from midi_vae_tpu.models.classifier import make_judge
        from midi_vae_tpu.training.classifier_trainer import load_classifier

        for kind in ("pitch", "velocity", "instrument"):
            kind_dir = os.path.join(args.classifiers, kind)
            if os.path.isdir(kind_dir):
                judges[kind] = make_judge(*load_classifier(kind_dir))
    elif args.bundle is not None:
        # sealed judges, if the bundle carries them
        # (export_serving.py --classifiers): the whole transfer-and-judge
        # pipeline then runs from sealed programs, no model builds
        judges = ctx.judges
        if judges:
            print(f"judging with sealed programs: {sorted(judges)}")

    def judge_windows(Y_song, I_pred, V_flat, label, C_target):
        """Mean per-judge confidence that the windows are class C_target
        (the evaluation harness's switched-judge columns, for one song)."""
        from midi_vae_tpu.evaluation.generation import split_song_back_to_samples
        from midi_vae_tpu.evaluation.sampling import add_silent_column

        windows = split_song_back_to_samples(Y_song, cfg.output_length)
        report = []
        if "pitch" in judges:
            x = np.stack([add_silent_column(w, cfg) for w in windows])
            report.append(("pitch", judges["pitch"](x)))
        if "velocity" in judges and V_flat is not None:
            v = V_flat.reshape(len(windows), cfg.output_length, 1)
            report.append(("velocity", judges["velocity"](v)))
        if "instrument" in judges and I_pred is not None:
            report.append(("instrument", judges["instrument"](I_pred)))
        if report:
            parts = ", ".join(
                f"{name} {float(np.mean(probs[:, C_target])):.3f}"
                for name, probs in report
            )
            print(f"  judge confidence in {cfg.classes[C_target]} ({label}): {parts}")

    C_switch = _class_index(cfg, args.to_class, "--to-class")

    # signature-conditioned checkpoints: normalize the song's signature
    # with the TRAIN-time stats train.py saved next to the checkpoints
    sig_stats = None
    if cfg.append_signature_vector_to_latent:
        stats_path = os.path.join(run_dir, "signature_stats.npz")
        if os.path.exists(stats_path):
            d = np.load(stats_path)
            sig_stats = (d["mean"], d["std"])
        else:
            print(
                "warning: signature-conditioned model but no "
                "signature_stats.npz in the run dir; using zero signatures"
            )

    for path in args.input:
        song = load_rolls_from_path(path, cfg)
        if song is None or song.X.shape[0] == 0:
            print(f"skip {path}: no usable windows")
            continue
        S_song = None
        if sig_stats is not None:
            from midi_vae_tpu.data.batching import signature_vectors_for_songs

            S_song = (
                signature_vectors_for_songs([song.Y], cfg)[0] - sig_stats[0]
            ) / sig_stats[1]
        if args.from_class is not None:
            C = _class_index(cfg, args.from_class, "--from-class")
        else:
            # the dataset labeling rule matches class names against the
            # CORPUS-RELATIVE directory path (data/dataset.py); for a lone
            # file the corpus root is unknown, so match path components
            # deepest-first -- the nearest directory wins over ancestors
            C = None
            parts = os.path.dirname(os.path.abspath(path)).split(os.sep)
            for component in reversed(parts):
                for i, c in enumerate(cfg.classes):
                    if c.lower() in component.lower():
                        C = i
                        break
                if C is not None:
                    break
            if C is None:
                C = 0
                print(
                    f"note: no class name found in the directory of {path}; "
                    f"assuming source class {cfg.classes[0]!r} "
                    "(use --from-class to override)"
                )
        if C == C_switch:
            print(f"skip {path}: source class equals target class")
            continue

        (Y_sw, I_sw, V_sw, D_sw, _N), _switched = ctx.style_transfer_song(
            song.X, song.I, song.V, song.D, C=C, C_switch=C_switch, S=S_song
        )
        input_programs = instrument_matrix_to_programs(
            song.I, cfg.instrument_attach_method
        )
        programs = (
            input_programs if args.keep_instruments or not cfg.meta_instrument
            else vote_for_programs(I_sw, cfg)
        )
        bpm = args.bpm if args.bpm is not None else song.tempo
        stem = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(
            args.output,
            f"{stem}_{cfg.classes[C]}_to_{cfg.classes[C_switch]}.mid",
        )
        save_rolls_as_midi(Y_sw, programs, cfg, out, bpm, V_sw, D_sw)
        print(f"{path} [{cfg.classes[C]}] -> {out} "
              f"(programs {input_programs} -> {programs})")
        if judges:
            judge_windows(
                song.Y[..., : cfg.new_num_notes].reshape(-1, cfg.new_num_notes),
                song.I[None],  # one matrix per song, like the reference judge
                song.V.reshape(-1),
                "original", C_switch,
            )
            judge_windows(
                Y_sw, I_sw if cfg.meta_instrument else None,
                V_sw if cfg.meta_velocity else None,
                "transferred", C_switch,
            )

        if args.write_reconstruction:
            z = ctx.encode_song(song.X, song.I, song.V, song.D)
            # reference-eval reconstruction semantics: H = z unshifted
            # (see evaluation/harness.py section_autoencoding)
            Y_r, I_r, V_r, D_r, _ = ctx.decode_and_process(
                z, history=z,
                additional=ctx.additional_for(C, S_song, len(z)),
                sample_method="argmax",
            )
            rec = os.path.join(args.output, f"{stem}_reconstruction.mid")
            rec_programs = (
                input_programs if args.keep_instruments or not cfg.meta_instrument
                else vote_for_programs(I_r, cfg)
            )
            save_rolls_as_midi(Y_r, rec_programs, cfg, rec, bpm, V_r, D_r)
            print(f"  reconstruction -> {rec}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

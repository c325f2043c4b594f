"""Serving bundles: AOT-exported, weights-baked inference programs.

Production deployment wants a sealed artifact, not a Python model object:
this module exports the three serving programs a deployed MIDI-VAE needs --

  * ``encode``          windows -> latents (deterministic: the eval-mode
                        z = z_mean the reference uses with
                        ``do_not_sample_in_evaluation``,
                        vae_evaluation.py:481-486),
  * ``decode_argmax``   latents (+ history/additional) -> argmax'd head
                        outputs (note indices, instrument indices,
                        velocities, held flags),
  * ``style_transfer``  windows + latent permutation -> one-program
                        encode -> z-swap -> history roll -> decode
                        (the fused transfer of GenerationContext,
                        vae_evaluation.py:2448-2625 semantics)

-- as serialized ``jax.export`` artifacts (StableHLO) with the parameters
BAKED IN as constants, plus (optionally) the three style-classifier
JUDGES of vae_evaluation.py:75-117 sealed the same way
(``export_classifier_judges``: per-kind softmax predict programs + the
0.999-0.5-weighted ensemble at load time), so the full
transfer-and-judge pipeline runs from sealed artifacts alone. A bundle
directory is self-contained: one blob per program per batch bucket, the
run's ``config.json``, and a ``manifest.json`` recording shapes,
platforms, and versions. Loading
needs only jax -- no model classes, no checkpoint handling, no
Python-side weight state -- and calls run the exact compiled computation
that was exported (Pallas kernels included when exported on/for TPU).

Shapes are static (XLA's compilation model), so a bundle carries one
compiled program per BATCH BUCKET (``batch_sizes``, e.g. [8, 64, 256]);
the loader auto-pads a request to the smallest adequate bucket and trims
the outputs, so callers pass any row count up to the largest bucket.
Exported programs enforce their input shapes/dtypes at call time.
Outputs are float-EQUIVALENT to the live jitted model (identical argmax
decisions; ~1e-7 float noise from a different XLA fusion schedule after
serialization), not bit-identical -- tests/test_serving.py pins both
properties.

The reference has no serving story at all -- its "deployment" is editing
vae_evaluation.py toggles and re-running the 2,910-line script with Keras
checkpoints next to it (SURVEY.md L5).
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

import numpy as np

from .config import Config

_PROGRAMS = ("encode", "decode_argmax", "style_transfer")
_MANIFEST = "manifest.json"
# bumped when the on-disk layout or program signatures change incompatibly
BUNDLE_FORMAT = 1


def _encoder_shapes(cfg: Config, B: int) -> dict[str, tuple]:
    shapes = {"X": (B, cfg.input_length, cfg.input_dim)}
    if cfg.meta_instrument:
        shapes["I"] = (B, cfg.max_voices, cfg.instrument_dim)
    if cfg.meta_velocity:
        shapes["V"] = (B, cfg.meta_velocity_length, 1)
    if cfg.meta_held_notes:
        shapes["D"] = (B, cfg.meta_held_notes_length, 2)
    return shapes


def _export_platform(platforms: list[str] | None) -> str | None:
    """Model platform to build the export graphs for.

    Pallas kernels only lower for TPU: exporting from a TPU-backend
    process with ``platforms=['cpu']`` (or any mixed list) must take the
    jnp paths or jax.export dies with "Only interpret mode is supported
    on CPU backend". None = follow the current backend (the model
    default)."""
    if not platforms:
        return None
    return "tpu" if all(p == "tpu" for p in platforms) else "cpu"


def export_serving_bundle(
    cfg: Config,
    params,
    out_dir: str,
    batch_size: int | Sequence[int] = 256,
    platforms: list[str] | None = None,
) -> dict[str, Any]:
    """Export the three serving programs for ``cfg``/``params``.

    ``batch_size``: one bucket or a list of buckets -- each bucket gets
    its own compiled program triple (XLA shapes are static; the loader
    picks the smallest adequate bucket per call).
    ``platforms``: jax.export lowering platforms (default: the current
    backend). Exporting on a TPU host (or with platforms=['tpu']) bakes
    the Pallas inference kernels; a CPU export takes the jnp paths.
    Returns the manifest dict."""
    import jax
    from jax import export as jexport

    from .evaluation.generation import (
        decode_argmax_graph,
        transfer_argmax_graph,
    )
    from .models.vae import MidiVAE

    model = MidiVAE(cfg, platform=_export_platform(platforms))
    buckets = sorted(
        {int(b) for b in (
            [batch_size] if isinstance(batch_size, int) else batch_size
        )}
    )
    if not buckets or buckets[0] < 1:
        raise ValueError(f"bad batch buckets {buckets}")
    dev = jax.devices()[0]
    params = jax.device_put(
        jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params),
        dev,
    )
    f32 = np.float32

    # the exact graphs GenerationContext jits live, with params closed over
    # and the deterministic eps=0 encode (no rng in exported signatures)
    _decode_argmax = decode_argmax_graph(model, cfg)
    _transfer_argmax = transfer_argmax_graph(model, cfg, 0.0)

    def encode_fn(batch):
        return model.encode(params, batch, None, 0.0)

    def decode_argmax_fn(z, H, A):
        return _decode_argmax(params, z, H, A)

    def style_transfer_fn(batch, perm, A):
        return _transfer_argmax(params, batch, perm, A, None)

    a_dim = max(1, cfg.decoder_additional_input_dim)
    perm_arg = jax.ShapeDtypeStruct((cfg.latent_dim,), np.int32)
    kw = {"platforms": platforms} if platforms else {}

    os.makedirs(out_dir, exist_ok=True)
    sizes: dict[str, int] = {}
    exported_platforms = None
    for B in buckets:
        batch_args = {
            k: jax.ShapeDtypeStruct(s, f32)
            for k, s in _encoder_shapes(cfg, B).items()
        }
        z_arg = jax.ShapeDtypeStruct((B, cfg.latent_dim), f32)
        h_arg = jax.ShapeDtypeStruct((B, cfg.latent_dim), f32)
        a_arg = jax.ShapeDtypeStruct((B, a_dim), f32)
        exports = {
            "encode": jexport.export(jax.jit(encode_fn), **kw)(batch_args),
            "decode_argmax": jexport.export(jax.jit(decode_argmax_fn), **kw)(
                z_arg, h_arg, a_arg
            ),
            "style_transfer": jexport.export(
                jax.jit(style_transfer_fn), **kw
            )(batch_args, perm_arg, a_arg),
        }
        exported_platforms = list(exports["encode"].platforms)
        for name, exp in exports.items():
            blob = exp.serialize()
            fname = f"{name}@{B}.jaxexport"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(blob)
            sizes[fname] = len(blob)

    cfg.save(os.path.join(out_dir, "config.json"))
    manifest = {
        "bundle_format": BUNDLE_FORMAT,
        "programs": list(_PROGRAMS),
        "batch_sizes": buckets,
        "encoder_input_dims": {
            k: list(s[1:]) for k, s in _encoder_shapes(cfg, 1).items()
        },
        "latent_dim": cfg.latent_dim,
        "additional_dim": a_dim,
        "platforms": exported_platforms,
        "deterministic_encode": True,
        "jax_version": jax.__version__,
        "blob_bytes": sizes,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def export_classifier_judges(
    classifiers: dict,
    bundle_dir: str,
    batch_size: int | Sequence[int] = 256,
    platforms: list[str] | None = None,
) -> dict[str, Any]:
    """Seal trained style-classifier judges into an EXISTING serving bundle.

    ``classifiers``: kind -> (StyleClassifier, params) for any subset of
    {'pitch', 'velocity', 'instrument'} (the three judges of
    /root/reference/vae_evaluation.py:75-117). Each judge's softmax
    ``predict`` is AOT-exported per batch bucket with the weights baked in
    (``judge_<kind>@<B>.jaxexport``); the per-kind ClassifierSpec is
    recorded in the manifest so the loader can replay the HOST-side input
    preprocessing (velocity transforms) without the model classes.

    Shapes are static: sequence-kind judges are sealed at the DECODED
    window length (``cfg.output_length`` -- the transfer-and-judge use
    case the bundle serves). In a config where ``input_length !=
    output_length``, judging raw ENCODER windows needs the live
    ``make_judge`` surface instead (the live RNN handles any T); the
    loader rejects mismatched trailing dims with a clear error. The
    shipped reference configs have the two lengths equal. With
    judges sealed, ``transfer --bundle`` runs the full
    transfer-and-judge pipeline from sealed artifacts alone -- no
    checkpoint restore, no model builds. Returns the updated manifest."""
    import dataclasses

    import jax
    from jax import export as jexport

    manifest_path = os.path.join(bundle_dir, _MANIFEST)
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(
            f"{bundle_dir!r} has no manifest -- export the VAE bundle "
            "first (export_serving_bundle)"
        )
    with open(manifest_path) as f:
        manifest = json.load(f)
    cfg = Config.load(os.path.join(bundle_dir, "config.json"))
    buckets = sorted(
        {int(b) for b in (
            [batch_size] if isinstance(batch_size, int) else batch_size
        )}
    )
    kw = {"platforms": platforms} if platforms else {}
    dev = jax.devices()[0]
    plat = _export_platform(platforms)

    judges_manifest: dict[str, Any] = {}
    for kind, (model, params) in classifiers.items():
        spec = model.spec
        if plat is not None and model.platform != plat:
            # retarget the graph at the LOWERING platform (kernels vs jnp
            # paths), not whatever platform the live model was built for
            from .models.classifier import StyleClassifier

            model = StyleClassifier(spec, platform=plat)
        row_dims = {
            "pitch": (cfg.output_length, spec.input_dim),
            "velocity": (cfg.output_length, 1),
            "instrument": (cfg.max_voices, spec.input_dim),
        }
        if kind not in row_dims:
            raise ValueError(f"unknown judge kind {kind!r}")
        p = jax.device_put(
            jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float32), params
            ),
            dev,
        )

        def predict_fn(x, _m=model, _p=p):
            return _m.predict(_p, x)

        sizes: dict[str, int] = {}
        for B in buckets:
            arg = jax.ShapeDtypeStruct((B, *row_dims[kind]), np.float32)
            exp = jexport.export(jax.jit(predict_fn), **kw)(arg)
            blob = exp.serialize()
            fname = f"judge_{kind}@{B}.jaxexport"
            with open(os.path.join(bundle_dir, fname), "wb") as f:
                f.write(blob)
            sizes[fname] = len(blob)
        judges_manifest[kind] = {
            "row_dims": list(row_dims[kind]),
            "spec": dataclasses.asdict(spec),
            "blob_bytes": sizes,
        }

    manifest["judges"] = judges_manifest
    manifest["judge_batch_sizes"] = buckets
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ServingBundle:
    """A loaded bundle: sealed compiled programs, numpy in/out.

    ``encode(batch)``, ``decode_argmax(z, H, A)``, and
    ``style_transfer(batch, perm, A)`` accept any row count up to the
    largest exported bucket: inputs are zero-padded to the smallest
    adequate bucket and outputs trimmed back.
    """

    def __init__(self, bundle_dir: str):
        import jax
        from jax import export as jexport

        manifest_path = os.path.join(bundle_dir, _MANIFEST)
        if not os.path.exists(manifest_path):
            raise FileNotFoundError(
                f"{bundle_dir!r} has no manifest.json -- is this a serving "
                "bundle (tools/export_serving.py --out)?"
            )
        with open(manifest_path) as f:
            self.manifest = json.load(f)
        fmt = int(self.manifest.get("bundle_format", 1))
        if fmt > BUNDLE_FORMAT:
            raise RuntimeError(
                f"bundle {bundle_dir!r} has format {fmt}, newer than this "
                f"framework supports ({BUNDLE_FORMAT}); upgrade the package "
                "or re-export the bundle"
            )
        platforms = [p.lower() for p in self.manifest.get("platforms") or []]
        backend = jax.default_backend().lower()
        if platforms and backend not in platforms:
            raise RuntimeError(
                f"bundle {bundle_dir!r} was exported for platform(s) "
                f"{platforms}; this process runs on {backend!r}. Re-export "
                f"with --platforms {backend} (tools/export_serving.py) or "
                "load it on a matching host"
            )
        self.bundle_dir = bundle_dir
        self.cfg = Config.load(os.path.join(bundle_dir, "config.json"))
        self.batch_sizes = [int(b) for b in self.manifest["batch_sizes"]]
        self._fns = {}
        for name in self.manifest["programs"]:
            for B in self.batch_sizes:
                path = os.path.join(bundle_dir, f"{name}@{B}.jaxexport")
                with open(path, "rb") as f:
                    self._fns[(name, B)] = jexport.deserialize(f.read())
        # sealed classifier judges (export_classifier_judges), if present
        self._judge_meta = self.manifest.get("judges", {})
        self.judge_batch_sizes = [
            int(b) for b in self.manifest.get("judge_batch_sizes", [])
        ]
        for kind in self._judge_meta:
            for B in self.judge_batch_sizes:
                path = os.path.join(bundle_dir, f"judge_{kind}@{B}.jaxexport")
                with open(path, "rb") as f:
                    self._fns[(f"judge_{kind}", B)] = jexport.deserialize(
                        f.read()
                    )

    @property
    def max_batch(self) -> int:
        return self.batch_sizes[-1]

    def bucket_for(self, n: int) -> int:
        for B in self.batch_sizes:
            if n <= B:
                return B
        raise ValueError(
            f"{n} rows exceed the bundle's largest bucket {self.max_batch}"
        )

    def _pad_rows(self, a, B: int, dtype=np.float32):
        a = np.asarray(a, dtype)
        p = np.zeros((B,) + a.shape[1:], dtype)
        p[: a.shape[0]] = a
        return p

    def pad_batch(self, batch: dict, B: int | None = None) -> tuple[dict, int]:
        """Zero-pad a partial encoder batch to a bucket; returns
        (padded batch, real row count)."""
        n = int(np.asarray(batch["X"]).shape[0])
        B = self.bucket_for(n) if B is None else B
        out = {}
        for k, dims in self.manifest["encoder_input_dims"].items():
            a = np.asarray(batch[k], np.float32)
            if list(a.shape[1:]) != list(dims):
                raise ValueError(
                    f"{k}: expected trailing dims {dims}, got "
                    f"{list(a.shape[1:])}"
                )
            out[k] = self._pad_rows(a, B)
        return out, n

    def encode(self, batch: dict) -> np.ndarray:
        n = int(np.asarray(batch["X"]).shape[0])
        if n > self.max_batch:
            # encode is row-independent: chunk over the largest bucket
            chunks = [
                self.encode({k: np.asarray(v)[i: i + self.max_batch]
                             for k, v in batch.items()})
                for i in range(0, n, self.max_batch)
            ]
            return np.concatenate(chunks, axis=0)
        padded, n = self.pad_batch(batch)
        B = padded["X"].shape[0]
        z = np.asarray(self._fns[("encode", B)].call(padded))
        return z[:n]

    def decode_argmax(self, z, H=None, A=None) -> dict[str, np.ndarray]:
        z = np.atleast_2d(np.asarray(z, np.float32))
        n = z.shape[0]
        if n > self.max_batch:
            # row-independent given explicit H/A: chunk like encode
            def row(a, i):
                return None if a is None else np.atleast_2d(a)[i: i + self.max_batch]

            chunks = [
                self.decode_argmax(z[i: i + self.max_batch], row(H, i), row(A, i))
                for i in range(0, n, self.max_batch)
            ]
            return {
                k: np.concatenate([c[k] for c in chunks], axis=0)
                for k in chunks[0]
            }
        B = self.bucket_for(n)
        zp = self._pad_rows(z, B)
        Hp = (np.zeros((B, self.manifest["latent_dim"]), np.float32)
              if H is None else self._pad_rows(np.atleast_2d(H), B))
        Ap = (np.zeros((B, self.manifest["additional_dim"]), np.float32)
              if A is None else self._pad_rows(np.atleast_2d(A), B))
        out = self._fns[("decode_argmax", B)].call(zp, Hp, Ap)
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    def style_transfer(self, batch: dict, perm, A=None):
        padded, n = self.pad_batch(batch)
        B = padded["X"].shape[0]
        Ap = (np.zeros((B, self.manifest["additional_dim"]), np.float32)
              if A is None else self._pad_rows(np.atleast_2d(A), B))
        outs, switched = self._fns[("style_transfer", B)].call(
            padded, np.asarray(perm, np.int32), Ap
        )
        return (
            {k: np.asarray(v)[:n] for k, v in outs.items()},
            np.asarray(switched)[:n],
        )

    # -- song-level entry points (GenerationContext-compatible) ---------
    # The transfer CLI drives either a live GenerationContext or a loaded
    # bundle through this same four-method surface; bundles decode argmax
    # only (that is what was exported).

    def _song_batch(self, X, I, V, D) -> dict:
        from .data.batching import held_to_categorical, prepare_velocity

        cfg = self.cfg
        n = X.shape[0]
        D_cat = held_to_categorical(np.atleast_2d(D))
        V3 = prepare_velocity(np.atleast_2d(V), D_cat, cfg)
        batch = {"X": np.asarray(X, np.float32)}
        if cfg.meta_instrument:
            batch["I"] = np.tile(
                np.asarray(I, np.float32)[None], (n, 1, 1)
            )
        if cfg.meta_velocity:
            batch["V"] = np.asarray(V3, np.float32)
        if cfg.meta_held_notes:
            batch["D"] = np.asarray(D_cat, np.float32)
        return batch

    def additional_for(self, C, S, n):
        from .evaluation.generation import additional_rows

        return additional_rows(self.cfg, C, S, n)

    def encode_song(self, X, I, V, D) -> np.ndarray:
        """Windows of one song -> deterministic latents (n, latent)."""
        return self.encode(self._song_batch(X, I, V, D))

    def style_transfer_song(
        self, X, I, V, D, C: int, C_switch: int, S=None
    ):
        """MIDI->MIDI style transfer from the sealed programs alone:
        encode -> z[C] <-> z[C_switch] swap -> history roll -> argmax
        decode, identical contract to
        GenerationContext.style_transfer_song (the capability of
        /root/reference/vae_evaluation.py:2448-2625).

        Songs up to the largest bucket take the fused one-program path;
        longer songs COMPOSE the same pipeline from the sealed encode +
        decode programs (the history roll happens on the host between
        them -- the fused graph's exact semantics, transfer_argmax_graph),
        so a bundle serves any song length."""
        from .evaluation import sampling

        cfg = self.cfg
        batch = self._song_batch(X, I, V, D)
        n = batch["X"].shape[0]
        perm = np.arange(cfg.latent_dim)
        perm[[C, C_switch]] = perm[[C_switch, C]]
        A = self.additional_for(C_switch, S, n)
        if n <= self.max_batch:
            idx, switched = self.style_transfer(batch, perm, A)
        else:
            z = self.encode(batch)
            switched = z[:, perm]
            H = np.zeros_like(switched)
            H[1:] = switched[:-1]
            idx = self.decode_argmax(switched, H, A)
        return sampling.process_argmax_outputs(idx, cfg), switched

    # -- sealed classifier judges --------------------------------------

    @property
    def judges(self) -> dict:
        """kind -> padded numpy predict callable over the SEALED judge
        programs -- the same judge surface ``models.classifier.make_judge``
        builds from live models (the transfer CLI and evaluation harness
        consume either interchangeably). Empty dict when the bundle was
        exported without judges."""
        from .models.classifier import ClassifierSpec

        out = {}
        for kind, meta in self._judge_meta.items():
            spec = ClassifierSpec(**meta["spec"])

            def predict(x, _kind=kind, _spec=spec, _dims=meta["row_dims"]):
                x = np.asarray(_spec.preprocess_inputs(x), np.float32)
                if list(x.shape[1:]) != list(_dims):
                    raise ValueError(
                        f"judge_{_kind}: expected trailing dims {_dims}, "
                        f"got {list(x.shape[1:])}"
                    )
                if x.shape[0] == 0:
                    # make_judge parity: empty in -> empty (0, k) out
                    return np.zeros((0, _spec.num_classes), np.float32)
                top = self.judge_batch_sizes[-1]
                chunks = []
                # rows are independent: chunk over the top bucket
                for i in range(0, x.shape[0], top):
                    part = x[i: i + top]
                    n = part.shape[0]
                    B = next(b for b in self.judge_batch_sizes if n <= b)
                    probs = self._fns[(f"judge_{_kind}", B)].call(
                        self._pad_rows(part, B)
                    )
                    chunks.append(np.asarray(probs)[:n])
                return np.concatenate(chunks, axis=0)

            out[kind] = predict
        return out

    def ensemble_prediction(self, pitch_x, instrument_x, velocity_x):
        """The reference's 3-judge ensemble (vae_evaluation.py:110-117)
        over the sealed programs: weighted mean of the per-judge softmax
        probabilities (weights 0.999-0.5 each)."""
        from .models.classifier import ensemble_prediction

        judges = self.judges
        missing = {"pitch", "instrument", "velocity"} - set(judges)
        if missing:
            raise RuntimeError(
                f"bundle lacks sealed judges {sorted(missing)}; re-export "
                "with tools/export_serving.py --classifiers"
            )
        return np.asarray(
            ensemble_prediction(
                judges["pitch"](pitch_x),
                judges["instrument"](instrument_x),
                judges["velocity"](velocity_x),
            )
        )

    def decode_and_process(
        self, z, history=None, additional=None, sample_method: str = "argmax",
        rng=None, independent_windows: bool = False,
    ):
        if sample_method != "argmax":
            raise ValueError(
                "serving bundles export argmax decoding only; "
                f"got sample_method={sample_method!r}"
            )
        from .evaluation import sampling

        idx = self.decode_argmax(z, history, additional)
        return sampling.process_argmax_outputs(
            idx, self.cfg, independent_windows=independent_windows
        )


def load_serving_bundle(bundle_dir: str) -> ServingBundle:
    return ServingBundle(bundle_dir)

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
BAKED IN as constants. A bundle directory is self-contained: three
``.jaxexport`` blobs, the run's ``config.json``, and a ``manifest.json``
recording shapes, platforms, and versions. Loading needs only jax -- no
model classes, no checkpoint handling, no Python-side weight state -- and
calls run the exact compiled computation that was exported (Pallas kernels
included when exported on/for TPU).

Shapes are static (XLA's compilation model): a bundle serves ONE batch
size; pad to it (``pad_batch``) or export several buckets. Exported
programs enforce their input shapes/dtypes at call time. Outputs are
float-EQUIVALENT to the live jitted model (identical argmax decisions;
~1e-7 float noise from a different XLA fusion schedule after
serialization), not bit-identical -- tests/test_serving.py pins both
properties.

The reference has no serving story at all -- its "deployment" is editing
vae_evaluation.py toggles and re-running the 2,910-line script with Keras
checkpoints next to it (SURVEY.md L5).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

from .config import Config

_PROGRAMS = ("encode", "decode_argmax", "style_transfer")
_MANIFEST = "manifest.json"


def _encoder_shapes(cfg: Config, B: int) -> dict[str, tuple]:
    shapes = {"X": (B, cfg.input_length, cfg.input_dim)}
    if cfg.meta_instrument:
        shapes["I"] = (B, cfg.max_voices, cfg.instrument_dim)
    if cfg.meta_velocity:
        shapes["V"] = (B, cfg.meta_velocity_length, 1)
    if cfg.meta_held_notes:
        shapes["D"] = (B, cfg.meta_held_notes_length, 2)
    return shapes


def export_serving_bundle(
    cfg: Config,
    params,
    out_dir: str,
    batch_size: int = 256,
    platforms: list[str] | None = None,
) -> dict[str, Any]:
    """Export the three serving programs for ``cfg``/``params``.

    ``platforms``: jax.export lowering platforms (default: the current
    backend). Exporting on a TPU host (or with platforms=['tpu']) bakes
    the Pallas inference kernels; a CPU export takes the jnp paths.
    Returns the manifest dict."""
    import jax
    from jax import export as jexport

    from .models.vae import MidiVAE

    model = MidiVAE(cfg)
    B = int(batch_size)
    dev = jax.devices()[0]
    params = jax.device_put(
        jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params),
        dev,
    )
    f32 = np.float32

    def encode_fn(batch):
        return model.encode(params, batch, None, 0.0)

    def decode_argmax_fn(z, H, A):
        outs = model.decode(
            params, z, history=H,
            additional=A if cfg.decoder_additional_input else None,
            inference=True,
        )
        import jax.numpy as jnp

        res = {"notes_idx": jnp.argmax(outs["notes"][0], axis=-1)}
        if "instrument" in outs:
            res["inst_idx"] = jnp.argmax(outs["instrument"][0], axis=-1)
        if "velocity" in outs:
            res["vel"] = outs["velocity"][0][..., 0]
        if "held" in outs:
            res["held_idx"] = jnp.argmax(outs["held"][0], axis=-1)
        if "next" in outs:
            res["next_idx"] = jnp.argmax(outs["next"][0], axis=-1)
        return res

    def style_transfer_fn(batch, perm, A):
        import jax.numpy as jnp

        z = model.encode(params, batch, None, 0.0)
        switched = z[:, perm]
        H = jnp.zeros_like(switched).at[1:].set(switched[:-1])
        return decode_argmax_fn(switched, H, A), switched

    enc_shapes = _encoder_shapes(cfg, B)
    batch_args = {
        k: jax.ShapeDtypeStruct(s, f32) for k, s in enc_shapes.items()
    }
    z_arg = jax.ShapeDtypeStruct((B, cfg.latent_dim), f32)
    h_arg = jax.ShapeDtypeStruct((B, cfg.latent_dim), f32)
    a_arg = jax.ShapeDtypeStruct(
        (B, max(1, cfg.decoder_additional_input_dim)), f32
    )
    perm_arg = jax.ShapeDtypeStruct((cfg.latent_dim,), np.int32)

    kw = {"platforms": platforms} if platforms else {}
    exports = {
        "encode": jexport.export(jax.jit(encode_fn), **kw)(batch_args),
        "decode_argmax": jexport.export(jax.jit(decode_argmax_fn), **kw)(
            z_arg, h_arg, a_arg
        ),
        "style_transfer": jexport.export(jax.jit(style_transfer_fn), **kw)(
            batch_args, perm_arg, a_arg
        ),
    }

    os.makedirs(out_dir, exist_ok=True)
    sizes = {}
    for name, exp in exports.items():
        blob = exp.serialize()
        with open(os.path.join(out_dir, f"{name}.jaxexport"), "wb") as f:
            f.write(blob)
        sizes[name] = len(blob)
    cfg.save(os.path.join(out_dir, "config.json"))
    manifest = {
        "programs": list(exports),
        "batch_size": B,
        "encoder_inputs": {k: list(v) for k, v in enc_shapes.items()},
        "latent_dim": cfg.latent_dim,
        "additional_dim": max(1, cfg.decoder_additional_input_dim),
        "platforms": list(exports["encode"].platforms),
        "deterministic_encode": True,
        "jax_version": jax.__version__,
        "blob_bytes": sizes,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ServingBundle:
    """A loaded bundle: sealed compiled programs, numpy in/out.

    ``encode(batch)``, ``decode_argmax(z, H, A)``, and
    ``style_transfer(batch, perm, A)`` run the exported computations;
    shapes must match ``manifest['batch_size']`` (use ``pad_batch``).
    """

    def __init__(self, bundle_dir: str):
        from jax import export as jexport

        with open(os.path.join(bundle_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.cfg = Config.load(os.path.join(bundle_dir, "config.json"))
        self._fns = {}
        for name in self.manifest["programs"]:
            with open(os.path.join(bundle_dir, f"{name}.jaxexport"), "rb") as f:
                self._fns[name] = jexport.deserialize(f.read())

    @property
    def batch_size(self) -> int:
        return int(self.manifest["batch_size"])

    def pad_batch(self, batch: dict) -> tuple[dict, int]:
        """Zero-pad a partial batch to the bundle's batch size; returns
        (padded batch, real row count)."""
        B = self.batch_size
        n = None
        out = {}
        for k, shape in self.manifest["encoder_inputs"].items():
            a = np.asarray(batch[k], np.float32)
            n = a.shape[0] if n is None else n
            if a.shape[0] > B:
                raise ValueError(
                    f"{a.shape[0]} rows exceed the bundle batch size {B}"
                )
            p = np.zeros(shape, np.float32)
            p[: a.shape[0]] = a
            out[k] = p
        return out, int(n or 0)

    def encode(self, batch: dict) -> np.ndarray:
        return np.asarray(self._fns["encode"].call(batch))

    def decode_argmax(self, z, H=None, A=None) -> dict[str, np.ndarray]:
        B = self.batch_size
        z = np.asarray(z, np.float32)
        H = (np.zeros((B, self.manifest["latent_dim"]), np.float32)
             if H is None else np.asarray(H, np.float32))
        A = (np.zeros((B, self.manifest["additional_dim"]), np.float32)
             if A is None else np.asarray(A, np.float32))
        out = self._fns["decode_argmax"].call(z, H, A)
        return {k: np.asarray(v) for k, v in out.items()}

    def style_transfer(self, batch: dict, perm, A=None):
        B = self.batch_size
        A = (np.zeros((B, self.manifest["additional_dim"]), np.float32)
             if A is None else np.asarray(A, np.float32))
        outs, switched = self._fns["style_transfer"].call(
            batch, np.asarray(perm, np.int32), A
        )
        return (
            {k: np.asarray(v) for k, v in outs.items()},
            np.asarray(switched),
        )


def load_serving_bundle(bundle_dir: str) -> ServingBundle:
    return ServingBundle(bundle_dir)

"""Reference-checkpoint I/O: Keras-2.0.8 ``save_weights`` HDF5 <-> params.

The reference persists models with ``model.save_weights(path)`` every
``save_step`` epochs and resumes with ``model.load_weights(path)``
(vae_training.py:121-123, :966-978; the ``.pickle`` extension is cosmetic --
Keras ``save_weights`` always writes HDF5). This module lets a migrating
user carry those checkpoints across:

  * ``read_weights_h5``     -- flatten a save_weights file to
                               {variable_name: array} (variable names are
                               globally unique, so the group layout --
                               autoencoder vs encoder/decoder files, nested
                               sub-Models -- is irrelevant for import),
  * ``vae_weight_schedule`` -- the deterministic (variable name, pytree
                               path, shape) schedule obtained by replaying
                               ``VAE.create``'s layer creation order
                               (vae_definition.py:212-761) with Keras-2.0.8
                               auto-naming semantics,
  * ``params_from_weights`` -- assemble this framework's parameter pytree
                               from the flattened weights,
  * ``write_weights_h5``    -- the reverse: export a trained parameter
                               pytree in the reference's on-disk layout so
                               the ORIGINAL Keras code can load it with
                               ``load_weights(..., by_name=True)``.

Naming model (Keras 2.0.8 semantics):

  * explicitly named layers keep their name and do NOT advance any counter
    (vae_definition.py names every encoder layer: 'gru_1'/'gru_2'/...,
    'gru_meta_instrument', 'extra_instrument_after_concat_layer',
    'extra_layer', 'z_mean', 'z_log_var'; and every RecurrentModel:
    'notes', 'meta_instrument', 'meta_velocity', 'meta_held_notes',
    'next_notes');
  * unnamed layers get ``snake_case(ClassName)_<n>`` with one global
    counter per prefix, in CREATION order -- in ``VAE.create`` those are
    exactly the decoder-side cells ('gru_cell_1', ...), the per-head
    readout Denses and state-init Denses ('dense_1', 'dense_2', ...), the
    Embedding ('embedding_1'), and the composer-probe Denses;
  * a layer's variables are created inside ``K.name_scope(layer.name)``,
    so they are named '<layer>/kernel:0', '<layer>/recurrent_kernel:0',
    '<layer>/bias:0' ('<layer>/embeddings:0' for Embedding).

The creation-order walk below mirrors ``tools/ref_parity_check._transplant``
(the schedule that is differentially validated against the EXECUTING
reference graph -- forwards to ~1e-6, gradients to 1.2e-06 rel); the
``--kerasio`` suite of tools/ref_parity_check.py additionally pins this
module's names/shapes/order against the executing ``VAE.create`` for the
whole model case matrix.

Known limits (documented, raise cleanly):

  * ``bidirectional`` checkpoints are rejected: Keras 2.0.8's
    ``Bidirectional`` wrapper creates both directions' variables inside the
    WRAPPER's name scope, so their names collide and depend on TF's
    uniquification ('bidirectional_1/kernel:0' vs '..._1/kernel_1:0') --
    name-based import would be guesswork (none of the released runs are
    bidirectional, models/*/params.txt `bidirectional: False`);
  * recurrentshop cell variable names are assumed to follow the standard
    Keras layer convention above; if a real artifact differs, every
    missing/unconsumed name is reported and ``name_map`` lets the caller
    remap without code changes;
  * ``save_weights`` stores no optimizer state (the reference's resume
    restarts Adam moments, vae_training.py:121-127) -- imported runs get a
    fresh optimizer, exactly as a reference resume would.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from ..config import Config

__all__ = [
    "Slot",
    "read_weights_h5",
    "vae_weight_schedule",
    "classifier_weight_schedule",
    "params_from_weights",
    "classifier_params_from_weights",
    "write_weights_h5",
    "config_from_params_txt",
    "epoch_from_filename",
]


# ---------------------------------------------------------------------------
# Schedule
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Slot:
    """One weighted reference layer: where its variables live in the h5
    file and where the corresponding leaves live in our parameter pytree.

    path:   tuple of keys/indices into the framework params pytree,
            addressing the {"w","u","b"} / {"w","b"} leaf dict.
    kind:   'rnn' (kernel/recurrent_kernel/bias), 'dense' (kernel/bias) or
            'embedding' (embeddings; a bias-free {"w"} lookup table on
            our side, exactly like the reference Embedding).
    layer_name: the Keras layer name owning the variables.
    group:  top-level h5 group the variables land in when saving the
            AUTOENCODER model (encoder layers are direct children; all
            decoder weights flatten into the nested-Model group 'decoder',
            vae_definition.py:355+436; composer probes into their Models').
    """

    path: tuple
    kind: str
    layer_name: str
    group: str

    def weight_names(self) -> dict[str, str]:
        """pytree leaf key -> h5 variable name."""
        n = self.layer_name
        if self.kind == "rnn":
            return {
                "w": f"{n}/kernel:0",
                "u": f"{n}/recurrent_kernel:0",
                "b": f"{n}/bias:0",
            }
        if self.kind == "dense":
            return {"w": f"{n}/kernel:0", "b": f"{n}/bias:0"}
        if self.kind == "embedding":
            return {"w": f"{n}/embeddings:0"}
        raise ValueError(self.kind)


class _Namer:
    """Keras-2.0.8 auto-naming: one global counter per prefix; explicitly
    named layers never touch a counter (keras/engine/topology.py get_uid
    semantics)."""

    def __init__(self):
        self.counts: dict[str, int] = {}

    def __call__(self, prefix: str) -> str:
        n = self.counts.get(prefix, 0) + 1
        self.counts[prefix] = n
        return f"{prefix}_{n}"


_RNN_PREFIX = {"GRU": "gru", "LSTM": "lstm", "SimpleRNN": "rnn"}
_CELL_PREFIX = {
    "GRU": "gru_cell",
    "LSTM": "lstm_cell",
    "SimpleRNN": "simple_rnn_cell",
}


def vae_weight_schedule(cfg: Config) -> list[Slot]:
    """Replay ``VAE.create``'s weighted-layer creation order
    (vae_definition.py:212-761) for ``cfg`` and return the Slot list.

    The creation order is the one ``tools/ref_parity_check._transplant``
    walks (validated against the executing reference); the names follow
    the Keras-2.0.8 rules in the module docstring.
    """
    if cfg.bidirectional:
        raise NotImplementedError(
            "bidirectional checkpoints cannot be imported by name: Keras "
            "2.0.8 Bidirectional variable names collide inside the wrapper "
            "scope (see midi_vae_tpu/utils/keras_h5.py docstring)"
        )
    rnn = _RNN_PREFIX[cfg.cell_type]
    cell = _CELL_PREFIX[cfg.cell_type]
    num_states = 2 if cfg.cell_type == "LSTM" else 1
    namer = _Namer()
    slots: list[Slot] = []

    # ----- encoder (vae_definition.py:212-217, 444-516) -----
    if cfg.use_embedding:
        slots.append(
            Slot(("encoder", "embedding"), "embedding",
                 namer("embedding"), group="OWN")
        )
    for i in range(cfg.num_layers_encoder):
        # explicit names 'gru_1'..'gru_n' (vae_definition.py:451-461)
        slots.append(
            Slot(("encoder", "notes_rnn", i), "rnn", f"{rnn}_{i + 1}",
                 group="OWN")
        )
    for flag, key, suffix in (
        (cfg.meta_instrument, "inst_rnn", "meta_instrument"),
        (cfg.meta_velocity, "vel_rnn", "meta_velocity"),
        (cfg.meta_held_notes, "held_rnn", "meta_held_notes"),
    ):
        if flag:  # explicit names (vae_definition.py:464-479)
            slots.append(
                Slot(("encoder", key, 0), "rnn", f"{rnn}_{suffix}",
                     group="OWN")
            )
    # reference predicate is (instrument or velocity or instrument) -- the
    # held-notes flag alone does NOT create the fusion Dense
    # (vae_definition.py:483, the `self.meta_instrument` repetition); our
    # model builds one whenever any meta branch exists, so the held-only
    # configuration has no reference-compatible checkpoint layout.
    if cfg.meta_instrument or cfg.meta_velocity:
        slots.append(
            Slot(("encoder", "fusion"), "dense",
                 "extra_instrument_after_concat_layer", group="OWN")
        )
    elif cfg.meta_held_notes:
        raise NotImplementedError(
            "meta_held_notes without meta_instrument/meta_velocity: the "
            "reference builds no fusion Dense there "
            "(vae_definition.py:483) but this framework does -- no "
            "compatible checkpoint layout exists"
        )
    if cfg.extra_layer:
        slots.append(
            Slot(("encoder", "extra"), "dense", "extra_layer", group="OWN")
        )
    slots.append(Slot(("encoder", "z_mean"), "dense", "z_mean", group="OWN"))
    slots.append(
        Slot(("encoder", "z_log_var"), "dense", "z_log_var", group="OWN")
    )

    # ----- decoder (vae_definition.py:519-728): for each head, the cells
    # then the readout Dense are created (inside the RecurrentModel's step
    # graph), then the state-init Denses -- all auto-named -----
    def head(path_key: str, n_layers: int) -> None:
        for i in range(n_layers):
            slots.append(
                Slot(("decoder", path_key, "cells", i), "rnn", namer(cell),
                     group="decoder")
            )
        slots.append(
            Slot(("decoder", path_key, "out"), "dense", namer("dense"),
                 group="decoder")
        )
        for j in range(n_layers * num_states):
            slots.append(
                Slot(("decoder", path_key, "init", j), "dense",
                     namer("dense"), group="decoder")
            )

    head("notes", cfg.num_layers_decoder)
    if cfg.meta_instrument:
        head("instrument", 1)
    if cfg.meta_velocity:
        head("velocity", 1)
    if cfg.meta_held_notes:
        head("held", 1)
    if cfg.meta_next_notes:
        head("next", cfg.num_layers_decoder)

    # ----- composer probes at outputs (vae_definition.py:747-761; created
    # in VAE.create AFTER the decoder, :411-428) -- the z-slice probes
    # (include_composer_decoder / signature_decoder) are weightless Lambdas
    if cfg.composer_decoder_at_notes_output:
        slots.append(
            Slot(("composer_at_notes", "rnn", 0), "rnn",
                 f"{rnn}_composer_decoder_at_notes",
                 group="composer_decoder_at_notes")
        )
        slots.append(
            Slot(("composer_at_notes", "out"), "dense", namer("dense"),
                 group="composer_decoder_at_notes")
        )
    if cfg.composer_decoder_at_instrument_output:
        slots.append(
            Slot(("composer_at_instrument", "rnn", 0), "rnn",
                 f"{rnn}_composer_decoder_at_instrument",
                 group="composer_decoder_at_instruments")
        )
        slots.append(
            Slot(("composer_at_instrument", "out"), "dense", namer("dense"),
                 group="composer_decoder_at_instruments")
        )
    return slots


def classifier_weight_schedule(cell_type: str, num_layers: int) -> list[Slot]:
    """The style classifiers' schedule: ``num_layers`` unnamed recurrent
    layers then one unnamed softmax Dense (pitch_classifier.py:89-95;
    identical in velocity_/instrument_classifier.py)."""
    rnn = _RNN_PREFIX[cell_type]
    namer = _Namer()
    slots = [
        Slot(("rnn", i), "rnn", namer(rnn), group="OWN")
        for i in range(num_layers)
    ]
    slots.append(Slot(("out",), "dense", namer("dense"), group="OWN"))
    return slots


# ---------------------------------------------------------------------------
# HDF5 read / write (Keras 2.0.8 save_weights layout:
# f.attrs['layer_names']; per-layer group with attrs['weight_names'] and one
# dataset per variable name)
# ---------------------------------------------------------------------------


def read_weights_h5(paths) -> dict[str, np.ndarray]:
    """Flatten one or more ``save_weights`` files into
    {variable_name: float32 array}. Accepts the autoencoder file, the
    encoder/decoder pair, or any combination (vae_training.py saves all
    three, :966-978); the same variable appearing in several files must
    agree bit-for-bit."""
    import h5py

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    out: dict[str, np.ndarray] = {}
    for path in paths:
        with h5py.File(path, "r") as f:
            layer_names = [
                n.decode() if isinstance(n, bytes) else str(n)
                for n in f.attrs["layer_names"]
            ]
            for lname in layer_names:
                g = f[lname]
                for wn in g.attrs.get("weight_names", []):
                    wn = wn.decode() if isinstance(wn, bytes) else str(wn)
                    arr = np.asarray(g[wn], dtype=np.float32)
                    if wn in out and not np.array_equal(out[wn], arr):
                        raise ValueError(
                            f"{wn} appears in several files with different "
                            "values"
                        )
                    out[wn] = arr
    return out


def _walk(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def params_from_weights(
    weights: dict[str, np.ndarray],
    cfg: Config,
    template,
    name_map: dict[str, str] | None = None,
    strict: bool = True,
):
    """Assemble a framework parameter pytree from flattened h5 weights.

    ``template`` supplies the pytree structure and shapes (use
    ``MidiVAE(cfg).init_params(key)``); every schedule leaf is filled from
    the correspondingly named variable with a shape assert. ``name_map``
    remaps expected variable names to actual ones (the recurrentshop
    escape hatch). ``strict=True`` requires a complete import: every
    schedule slot filled AND every h5 variable consumed. ``strict=False``
    fills what is present (e.g. importing only the encoder file) and
    ignores leftovers -- shapes are still checked."""
    schedule = vae_weight_schedule(cfg)
    return _fill(schedule, weights, template, name_map, strict)


def classifier_params_from_weights(
    weights, cell_type: str, num_layers: int, template,
    name_map=None, strict: bool = True,
):
    schedule = classifier_weight_schedule(cell_type, num_layers)
    return _fill(schedule, weights, template, name_map, strict)


def _fill(schedule, weights, template, name_map, strict):
    import jax

    name_map = name_map or {}
    remaining = dict(weights)
    out = jax.tree_util.tree_map(lambda x: x, template)  # deep-ish copy

    def take(name: str, want_shape) -> np.ndarray | None:
        name = name_map.get(name, name)
        if name not in remaining:
            if not strict:
                return None
            near = sorted(remaining)
            raise KeyError(
                f"checkpoint is missing variable {name!r} "
                f"(unconsumed variables: {near[:8]}...; pass name_map to "
                "remap if the artifact uses different internal names)"
            )
        arr = remaining.pop(name)
        if tuple(arr.shape) != tuple(want_shape):
            raise ValueError(
                f"{name}: checkpoint shape {arr.shape} vs expected "
                f"{tuple(want_shape)} -- config/checkpoint mismatch"
            )
        return arr

    for slot in schedule:
        leaf = _walk(out, slot.path)
        for key, vname in slot.weight_names().items():
            arr = take(vname, np.shape(leaf[key]))
            if arr is not None:
                leaf[key] = arr
    if strict and remaining:
        raise ValueError(
            f"{len(remaining)} checkpoint variables were not consumed "
            f"(first few: {sorted(remaining)[:8]}) -- the config does not "
            "describe this checkpoint"
        )
    return out


def write_weights_h5(path: str, schedule: list[Slot], params,
                     model: str = "autoencoder") -> None:
    """Export ``params`` in the reference's ``save_weights`` layout.

    ``model`` picks the group structure:
      * 'autoencoder': encoder layers as top-level groups, every decoder
        weight inside one nested-Model group 'decoder' (weight order =
        creation order; real Keras orders a nested Model's weights
        topologically, so load this file with ``by_name=True``),
      * 'encoder' / 'decoder': only that sub-model's slots, each weighted
        layer its own top-level group -- the per-group weight order is then
        exact, matching the files vae_training.py:966-978 writes,
      * 'model': every slot its own group (the classifiers' flat layout).
    """
    import h5py

    if model == "encoder":
        schedule = [s for s in schedule if s.path[0] == "encoder"]
    elif model == "decoder":
        schedule = [s for s in schedule if s.path[0] == "decoder"]
    if model in ("encoder", "decoder", "model"):
        schedule = [
            Slot(s.path, s.kind, s.layer_name, "OWN") for s in schedule
        ]

    groups: dict[str, list[tuple[str, np.ndarray]]] = {}
    order: list[str] = []
    for slot in schedule:
        gname = slot.layer_name if slot.group == "OWN" else slot.group
        if gname not in groups:
            groups[gname] = []
            order.append(gname)
        leaf = _walk(params, slot.path)
        for key, vname in slot.weight_names().items():
            groups[gname].append((vname, np.asarray(leaf[key], np.float32)))

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [n.encode() for n in order]
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.0.8"
        for gname in order:
            g = f.create_group(gname)
            g.attrs["weight_names"] = [n.encode() for n, _ in groups[gname]]
            for vname, arr in groups[gname]:
                g.create_dataset(vname, data=arr)


# ---------------------------------------------------------------------------
# params.txt -> Config
# ---------------------------------------------------------------------------

# params.txt keys with no Config counterpart (run bookkeeping or retired
# flags -- same set tests/test_data.py pins for the released configs)
_PARAMS_TXT_SKIP = {
    "load_from_pickle_instead_of_midi", "pickle_load_path",
    "train_set_size", "test_set_size", "train_paths", "test_paths",
    "instrument_pianoroll", "to_monophonic", "silent_noise",
    "noise_in_melody", "noise_factor_method", "noise_factor",
    "vae_without_log", "instrument_dim",
    # derived properties on Config (recomputed from the fields)
    "decoder_additional_input", "decoder_additional_input_dim",
    "meta_instrument_dim", "meta_instrument_length", "signature_dim",
    "meta_held_notes_length", "meta_next_notes_output_length",
    "input_dim", "output_dim", "composer_length", "num_composers",
}


def config_from_params_txt(path: str, classes, **overrides) -> Config:
    """Build a Config from a reference run's ``params.txt`` dump
    (vae_training.py:578-654). ``classes`` must be supplied: the reference
    never records the class names (they live in settings.py only).

    ``gate_activation`` defaults to 'hard_sigmoid' here (overridable): a
    params.txt comes from a Keras-2.0.8 run, whose GRU/LSTM recurrent
    activation defaulted to hard_sigmoid (PARITY.md deviation #12) -- a
    checkpoint trained under those gates only reproduces faithfully with
    them (the hard_sigmoid path runs on the XLA scan, not the Pallas
    kernels)."""
    import dataclasses

    fields = {f.name: f.type for f in dataclasses.fields(Config)}
    kwargs: dict = {"classes": tuple(classes)}
    with open(path) as f:
        for line in f:
            if ": " not in line:
                continue
            key, value = line.split(": ", 1)
            key, value = key.strip(), value.strip()
            if key in _PARAMS_TXT_SKIP or key not in fields:
                continue
            if value in ("True", "False"):
                kwargs[key] = value == "True"
                continue
            if value.startswith("["):
                continue  # list dumps (loss arrays etc.)
            for cast in (int, float):
                try:
                    kwargs[key] = cast(value)
                    break
                except ValueError:
                    pass
            else:
                kwargs[key] = value
    if "optimizer" in kwargs:
        kwargs["optimizer"] = str(kwargs["optimizer"]).lower()
    kwargs.setdefault("gate_activation", "hard_sigmoid")
    kwargs.update(overrides)
    return Config(**kwargs)


def epoch_from_filename(path: str) -> int | None:
    """'autoencoderEpoch600.pickle' -> 600 (vae_training.py:966-978);
    'pitch_classifier_epoch_90.pickle' -> 90 (pitch_classifier.py:154)."""
    m = re.search(r"[Ee]poch_?(\d+)", path)
    return int(m.group(1)) if m else None

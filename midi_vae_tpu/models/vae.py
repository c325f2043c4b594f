"""The MIDI-VAE model: recurrent beta-VAE with multi-head readout decoder.

TPU-native re-design of the reference ``VAE`` class
(/root/reference/vae_definition.py:39-761): one parameter pytree, pure
``encode``/``decode``/``apply`` functions built on ``lax.scan`` RNNs, and a
single fused loss replacing the Keras multi-output compile + ``add_loss`` KL
(vae_definition.py:332-441, :15-37).

Architecture (vae_definition.py:443-728, cf. SURVEY.md §3.5):

  encoder:  X -> stacked RNN -> h;  per-meta single RNNs over I/V/D -> concat
            -> fusion Dense(tanh) -> extra Dense(tanh) -> split halves
            -> Dense z_mean, Dense z_log_var;  z = mu + exp(logvar/2) * eps,
            eps ~ N(0, epsilon_std^2)
  decoder:  new_encoded = [z ⊕ history ⊕ additional]; per head: per-layer
            initial states = Dense(tanh)(new_encoded); autoregressive readout
            scan with Dense+activation output fed back as next input
  probes:   composer = softmax(z[:, :num_composers])       (vae_def.py:730-734)
            signature = act(z[:, k:k+signature_dim])        (vae_def.py:737-745)

Reference bugs NOT replicated (SURVEY.md §2.4): the encoder fusion condition
uses meta_held_notes too (vae_definition.py:483 repeats meta_instrument);
``self.epsilon_factor`` is read instead of the settings global
(vae_definition.py:509).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import Config
from .cells import (
    activation_fn,
    dense_apply,
    dense_init,
    get_cell,
    glorot_uniform,
)
from .rnn import (
    decode_autoregressive,
    decode_heads_merged,
    encode_sequence,
    init_decoder_states,
)

Params = dict[str, Any]


class MidiVAE:
    """Functional model wrapper: holds config, no state."""

    def __init__(self, cfg: Config, platform: str | None = None):
        """``platform``: the platform of the devices this model will actually
        run on (e.g. ``mesh.devices.flat[0].platform``). Pallas enablement
        must key off the COMPUTE devices, not the process default backend --
        a CPU mesh inside a TPU-default process would otherwise dispatch
        real Pallas kernels on CPU and crash ("Only interpret mode is
        supported on CPU backend"). None = use the default backend."""
        self.cfg = cfg
        self.platform = platform
        # optional device mesh; when its 'data' axis is >1 the forward runs
        # under shard_map (manual over 'data') so the Mosaic kernels -- which
        # GSPMD cannot auto-partition -- see per-shard batches. Set by the
        # trainer / generation context; None = plain single-program dispatch.
        self.mesh = None
        # True when the trainer's resident dataset is sharded over 'data'
        # (the HBM-overflow layout). The epoch program then gathers batches
        # from 'data'-sharded arrays; that gather's all-reduce feeding the
        # shard_map entry dynamic-slice trips a mis-rewrite in XLA's
        # all-reduce->reduce-scatter fusion pass (INTERNAL RET_CHECK,
        # wrong scatter dim under the degenerate {2,0,1} layout of the
        # (B,T,1) velocity plane), so the TRAINER compiles sharded-data
        # programs with that one pass disabled
        # (VAETrainer._epoch_compiler_options:
        # xla_tpu_enable_all_reduce_scatter_fusion=false) and the forward
        # keeps the fused kernels under shard_map like every other DP
        # layout. Verified by tools/compile_topology.py --shard-data on a
        # v5e-8 topology: 12 Mosaic kernels, sharded-corpus argument sizes.
        self.sharded_data = False
        self.cell = get_cell(cfg.cell_type)
        # test hook: run the FULL Pallas kernel tier (encoder layer kernels,
        # decode-head kernels, the multi-head kernel, per-step cells) in
        # interpret mode so CPU tests can exercise the complete kernel
        # dispatch glue -- including kernels under the shard_map manual
        # region (apply_sharded), the code path r4's real-topology bug
        # lived in -- without TPU hardware
        self._interpret = False

    def _pallas_enabled(self) -> bool:
        """Fused Pallas GRU/LSTM kernels: 'auto' enables them on TPU
        platforms. SimpleRNN has no kernel -- its step is one matmul + one
        activation, which XLA already emits as a single fusion."""
        cfg = self.cfg
        if cfg.cell_type not in ("GRU", "LSTM") or cfg.use_pallas == "off":
            return False
        if cfg.gate_activation != "sigmoid":
            return False  # kernels implement exact-sigmoid gates only
        if cfg.use_pallas == "on":
            return True
        if self.mesh is not None and self.mesh.shape.get("model", 1) > 1:
            # tensor-parallel meshes: the dense layers are GSPMD-sharded
            # over 'model', and Mosaic kernels cannot appear under any auto
            # mesh axis -- the RNN layers take the XLA scan path there
            # (DP-only meshes keep the kernels via fully-manual shard_map,
            # see apply_sharded)
            return False
        if self._interpret:
            # CPU test hook: the full kernel dispatch tier runs with
            # interpret-mode Pallas kernels, so tests exercise the
            # kernels-under-shard_map glue without TPU hardware
            return True
        if self.platform is not None:
            return self.platform == "tpu"
        import jax as _jax

        return _jax.default_backend() == "tpu"

    # ------------------------------------------------------------------
    # Parameter initialization
    # ------------------------------------------------------------------
    def init_params(self, key: jax.Array) -> Params:
        """Initialize the parameter pytree as PLAIN NUMPY (instant, no
        per-op XLA compiles or device dispatches -- see cells._np_rng).
        Callers place the tree on devices afterwards
        (parallel.shard_params)."""
        return self._init_params_impl(key)

    def _init_params_impl(self, key: jax.Array) -> Params:
        from .cells import split_keys

        cfg = self.cfg
        cell = self.cell
        keys = iter(split_keys(key, 256))

        def rnn_stack(n_layers: int, in_dim: int, bidirectional: bool) -> list:
            layers = []
            d = in_dim
            for i in range(n_layers):
                is_last = i == n_layers - 1
                if bidirectional and not is_last:
                    layers.append(
                        {
                            "fwd": cell.init(next(keys), d, cfg.lstm_size),
                            "bwd": cell.init(next(keys), d, cfg.lstm_size),
                        }
                    )
                    d = 2 * cfg.lstm_size
                else:
                    layers.append(cell.init(next(keys), d, cfg.lstm_size))
                    d = cfg.lstm_size
            return layers

        enc: Params = {}
        enc_in = cfg.embedding_dim if cfg.use_embedding else cfg.input_dim
        if cfg.use_embedding:
            # pure lookup table like the reference's Keras Embedding
            # (vae_definition.py:212-214) -- deliberately NO bias, so the
            # save_weights HDF5 round trip (utils/keras_h5.py) is lossless
            enc["embedding"] = {
                "w": glorot_uniform(
                    next(keys), (cfg.input_dim, cfg.embedding_dim)
                )
            }
        enc["notes_rnn"] = rnn_stack(cfg.num_layers_encoder, enc_in, cfg.bidirectional)
        n_meta = 0
        if cfg.meta_instrument:
            enc["inst_rnn"] = rnn_stack(1, cfg.meta_instrument_dim, False)
            n_meta += 1
        if cfg.meta_velocity:
            enc["vel_rnn"] = rnn_stack(1, 1, False)
            n_meta += 1
        if cfg.meta_held_notes:
            enc["held_rnn"] = rnn_stack(1, 2, False)
            n_meta += 1
        if n_meta:
            enc["fusion"] = dense_init(
                next(keys), cfg.lstm_size * (1 + n_meta), cfg.lstm_size
            )
        if cfg.extra_layer:
            enc["extra"] = dense_init(next(keys), cfg.lstm_size, cfg.lstm_size)
        half = cfg.lstm_size // 2 if cfg.split_lstm_vector else cfg.lstm_size
        other_half = (
            cfg.lstm_size - cfg.lstm_size // 2
            if cfg.split_lstm_vector
            else cfg.lstm_size
        )
        enc["z_mean"] = dense_init(next(keys), half, cfg.latent_dim)
        enc["z_log_var"] = dense_init(next(keys), other_half, cfg.latent_dim)

        new_dim = cfg.latent_dim
        if cfg.history:
            new_dim += cfg.latent_dim
        if cfg.decoder_additional_input:
            new_dim += cfg.decoder_additional_input_dim

        def head(n_layers: int, head_dim: int) -> Params:
            cells = []
            d = head_dim
            for _ in range(n_layers):
                cells.append(cell.init(next(keys), d, cfg.lstm_size))
                d = cfg.lstm_size
            init_dense = [
                dense_init(next(keys), new_dim, cfg.lstm_size)
                for _ in range(n_layers * cell.num_states)
            ]
            return {
                "cells": cells,
                "out": dense_init(next(keys), cfg.lstm_size, head_dim),
                "init": init_dense,
            }

        dec: Params = {"notes": head(cfg.num_layers_decoder, cfg.output_dim)}
        if cfg.meta_instrument:
            dec["instrument"] = head(1, cfg.meta_instrument_dim)
        if cfg.meta_velocity:
            dec["velocity"] = head(1, 1)
        if cfg.meta_held_notes:
            dec["held"] = head(1, 2)
        if cfg.meta_next_notes:
            dec["next"] = head(cfg.num_layers_decoder, cfg.output_dim)

        params: Params = {"encoder": enc, "decoder": dec}

        if cfg.composer_decoder_at_notes_output:
            params["composer_at_notes"] = {
                "rnn": rnn_stack(1, cfg.output_dim, False),
                "out": dense_init(next(keys), cfg.lstm_size, cfg.num_composers),
            }
        if cfg.composer_decoder_at_instrument_output:
            params["composer_at_instrument"] = {
                "rnn": rnn_stack(1, cfg.meta_instrument_dim, False),
                "out": dense_init(next(keys), cfg.lstm_size, cfg.num_composers),
            }
        return params

    # ------------------------------------------------------------------
    # Encoder
    # ------------------------------------------------------------------
    def encode_stats(
        self, params: Params, batch: dict, inference: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """X/I/V/D -> (z_mean, z_log_var). ``inference`` enables the
        in-kernel-projection whole-layer forward kernels (no residuals, no
        xp materialized in HBM; rs=False layers emit only the final h)."""
        cfg = self.cfg
        enc = params["encoder"]
        x = batch["X"]
        fused = self._pallas_enabled()
        # whole-scan-over-precomputed-xp kernels (remat backward) only still
        # apply when bf16 training explicitly disables the train kernels;
        # inference now takes the in-kernel-projection forward kernels
        ws = (
            not inference
            and fused
            and not cfg.fused_train_encoder
            and cfg.compute_dtype == "bfloat16"
        )
        if cfg.use_embedding:
            # one-hot @ table == embedding lookup; no bias (reference parity)
            x = x @ enc["embedding"]["w"]
        ftr = cfg.fused_train_encoder

        # NOTE: a fused multi-branch encode kernel (notes stack + every meta
        # branch in ONE kernel pair, ops/fused_train.gru_encode_multibranch_
        # train) exists and is tested, but MEASURED a wash end-to-end
        # (4.13M vs 4.14M note-steps/s interleaved A/B on v5e): the encoder
        # kernels are per-step compute-bound, so the independent branches'
        # work serializes inside the fused kernel just as it does across
        # separate kernels. The model keeps the simpler per-layer dispatch
        # (same verdict as the 2-layer stack kernel, gru_stack2_train_x).
        branch_specs: list[tuple[str, jnp.ndarray]] = []
        if cfg.meta_instrument:
            branch_specs.append(("inst_rnn", batch["I"]))
        if cfg.meta_velocity:
            branch_specs.append(("vel_rnn", batch["V"]))
        if cfg.meta_held_notes:
            branch_specs.append(("held_rnn", batch["D"]))
        h = encode_sequence(
            enc["notes_rnn"], x, cfg.cell_type, cfg.lstm_activation,
            cfg.bidirectional, fused=fused, whole_scan=ws, fused_train=ftr,
            inference=inference, gate_activation=cfg.gate_activation,
            interpret=self._interpret,
        )
        parts = [h]
        for name, b in branch_specs:
            parts.append(
                encode_sequence(
                    enc[name], b, cfg.cell_type, cfg.lstm_activation,
                    fused=fused, whole_scan=ws, fused_train=ftr,
                    inference=inference, gate_activation=cfg.gate_activation,
                    interpret=self._interpret,
                )
            )
        if len(parts) > 1:
            h = jnp.concatenate(parts, axis=-1)
            act = activation_fn(cfg.activation_before_splitting)
            h = act(dense_apply(enc["fusion"], h))
        if cfg.extra_layer:
            act = activation_fn(cfg.activation_before_splitting)
            h = act(dense_apply(enc["extra"], h))
        if cfg.split_lstm_vector:
            half = cfg.lstm_size // 2
            h1, h2 = h[:, :half], h[:, half:]
        else:
            h1 = h2 = h
        z_mean = dense_apply(enc["z_mean"], h1)
        z_log_var = dense_apply(enc["z_log_var"], h2)
        return z_mean, z_log_var

    def sample_z(
        self,
        z_mean: jnp.ndarray,
        z_log_var: jnp.ndarray,
        rng: jax.Array | None,
        epsilon_std: float,
    ) -> jnp.ndarray:
        """Reparameterized z = mu + exp(logvar/2)*eps, eps~N(0, epsilon_std^2)
        (vae_definition.py:498-502). epsilon_std=0 or rng=None => z_mean."""
        if rng is None or epsilon_std == 0.0:
            return z_mean
        eps = epsilon_std * jax.random.normal(rng, z_mean.shape, z_mean.dtype)
        return z_mean + jnp.exp(z_log_var / 2.0) * eps

    def encode(
        self,
        params: Params,
        batch: dict,
        rng: jax.Array | None = None,
        epsilon_std: float = 0.0,
    ) -> jnp.ndarray:
        """The reference ``encoder.predict`` equivalent: returns z.

        Inference-only entry point -- uses the whole-layer encoder kernels."""
        z_mean, z_log_var = self.encode_stats(params, batch, inference=True)
        return self.sample_z(z_mean, z_log_var, rng, epsilon_std)

    # ------------------------------------------------------------------
    # Decoder
    # ------------------------------------------------------------------
    def _decode_multihead_train(
        self, dec: Params, new_encoded: jnp.ndarray, B: int, dtype
    ) -> dict[str, tuple[jnp.ndarray, jnp.ndarray]]:
        """Training fast path: ONE fused kernel pair for the 2-layer notes
        head AND every 1-layer T-length meta head together
        (ops/fused_train.gru_decode_multihead_train) -- the narrow heads'
        per-step work rides in the gaps of the notes head's serial chain.
        Returns {} when no eligible side head exists or the combined kernel
        is rejected (VMEM / bf16) -- callers fall through to the per-head
        kernels."""
        cfg = self.cfg
        eligible = ("softmax", "sigmoid", "linear")
        side: list[tuple[str, int, str]] = []
        if (
            cfg.meta_velocity
            and cfg.meta_velocity_length == cfg.output_length
            and cfg.meta_velocity_activation in eligible
        ):
            side.append(("velocity", 1, cfg.meta_velocity_activation))
        if (
            cfg.meta_held_notes
            and cfg.meta_held_notes_length == cfg.output_length
            and cfg.meta_held_notes_activation in eligible
        ):
            side.append(("held", 2, cfg.meta_held_notes_activation))
        if not side:
            return {}

        from ..ops.fused_train import (
            _mh_use_pallas,
            gru_decode_multihead_train,
        )

        def arrays(name: str, head_dim: int) -> dict:
            h = dec[name]
            states = init_decoder_states(
                h["init"], new_encoded, cfg.cell_type,
                cfg.lstm_state_activation,
            )
            return {
                "cells": list(h["cells"]),
                "out": h["out"],
                "init": [s[0] for s in states],  # GRU: 1 state/layer
                "start": jnp.zeros((B, head_dim), dtype),
            }

        primary = arrays("notes", cfg.output_dim)
        head_arrays = tuple(arrays(n, d) for n, d, _ in side)
        out_acts = (cfg.activation, *(a for _, _, a in side))
        if not _mh_use_pallas(primary, head_arrays, cfg.lstm_activation,
                              out_acts, self._interpret):
            return {}
        residual_dtype = (
            jnp.bfloat16 if cfg.decode_residual_bf16 else None
        )
        results = gru_decode_multihead_train(
            primary, head_arrays, cfg.output_length,
            cfg.lstm_activation, out_acts, self._interpret,
            residual_dtype,
        )
        names = ["notes"] + [n for n, _, _ in side]
        return {
            name: (jnp.swapaxes(p, 0, 1), jnp.swapaxes(l, 0, 1))
            for name, (p, l) in zip(names, results)
        }

    def decode(
        self,
        params: Params,
        z: jnp.ndarray,
        history: jnp.ndarray | None = None,
        additional: jnp.ndarray | None = None,
        ground_truth: jnp.ndarray | None = None,
        next_ground_truth: jnp.ndarray | None = None,
        inference: bool = False,
    ) -> dict[str, tuple[jnp.ndarray, jnp.ndarray]]:
        """z (+history/additional) -> per-head (probs, logits) sequences.

        ``inference=True`` additionally enables the whole-scan Pallas decoder
        (ops/fused_decoder): fastest forward, but its backward recomputes the
        scan, so the training path keeps the per-step kernels."""
        cfg = self.cfg
        dec = params["decoder"]
        B = z.shape[0]
        parts = [z]
        if cfg.history:
            parts.append(
                history
                if history is not None
                else jnp.zeros((B, cfg.latent_dim), z.dtype)
            )
        if cfg.decoder_additional_input:
            parts.append(
                additional
                if additional is not None
                else jnp.zeros((B, cfg.decoder_additional_input_dim), z.dtype)
            )
        new_encoded = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else z

        fused_step = None
        if self._pallas_enabled():
            if cfg.cell_type == "LSTM":
                from ..ops.fused_lstm import make_fused_decoder_step
            else:
                from ..ops.fused_gru import make_fused_decoder_step

            fused_step = make_fused_decoder_step(
                cfg.lstm_activation, self._interpret
            )

        def run_head(
            name: str,
            head_dim: int,
            length: int,
            out_activation: str,
            gt: jnp.ndarray | None,
        ):
            h = dec[name]
            states = init_decoder_states(
                h["init"], new_encoded, cfg.cell_type, cfg.lstm_state_activation
            )
            start = jnp.zeros((B, head_dim), z.dtype)
            if (
                inference
                and fused_step is not None
                and gt is None
                and out_activation in ("softmax", "sigmoid", "linear")
            ):
                if cfg.cell_type == "LSTM":
                    from ..ops.fused_lstm import (
                        decoder_scan_supported,
                        fused_lstm_decode_scan,
                    )

                    if decoder_scan_supported(h["cells"], start, states):
                        probs, logits = fused_lstm_decode_scan(
                            h["cells"], h["out"], states, start, length,
                            cfg.lstm_activation, out_activation,
                            self._interpret,
                        )
                        return (
                            jnp.swapaxes(probs, 0, 1),
                            jnp.swapaxes(logits, 0, 1),
                        )
                else:
                    from ..ops.fused_decoder import (
                        decoder_scan_supported,
                        fused_decode_scan,
                    )

                    flat_states = [s[0] for s in states]  # GRU: 1 state/layer
                    if decoder_scan_supported(h["cells"], start, flat_states):
                        probs, logits = fused_decode_scan(
                            h["cells"], h["out"], flat_states, start, length,
                            cfg.lstm_activation, out_activation,
                            self._interpret,
                        )
                        return (
                            jnp.swapaxes(probs, 0, 1),
                            jnp.swapaxes(logits, 0, 1),
                        )
            if (
                not inference
                and cfg.fused_train_decoder
                and fused_step is not None
                and cfg.cell_type == "GRU"
                and gt is None
                and out_activation in ("softmax", "sigmoid", "linear")
            ):
                # training path: whole-head kernels BOTH ways (fused forward
                # + fused scan-transpose backward, ops/fused_train)
                from ..ops.fused_train import gru_decode_train

                flat_states = [s[0] for s in states]
                probs, logits = gru_decode_train(
                    h["cells"], h["out"], flat_states, start, length,
                    cfg.lstm_activation, out_activation, self._interpret,
                )
                return jnp.swapaxes(probs, 0, 1), jnp.swapaxes(logits, 0, 1)
            return decode_autoregressive(
                h["cells"],
                h["out"],
                states,
                start,
                length,
                cfg.cell_type,
                cfg.lstm_activation,
                out_activation,
                ground_truth=gt,
                fused_step=fused_step,
                gate_activation=cfg.gate_activation,
            )

        # T-length heads can merge into one scan (rnn.decode_heads_merged);
        # a teacher-forced notes head scans over known inputs and stays apart.
        merged_specs: dict = {}

        def head_spec(name: str, head_dim: int, out_activation: str) -> dict:
            h = dec[name]
            return {
                "cells": h["cells"],
                "out": h["out"],
                "init_states": init_decoder_states(
                    h["init"], new_encoded, cfg.cell_type, cfg.lstm_state_activation
                ),
                "start": jnp.zeros((B, head_dim), z.dtype),
                "out_activation": out_activation,
            }

        outputs: dict = {}
        # merged per-step scans exist to cut scan/dispatch overhead on the
        # NON-fused path; at inference with whole-scan kernels available,
        # run_head's fused decode is strictly faster -- never let the merge
        # flag pre-empt it
        merge = cfg.merge_decoder_scans and not (inference and fused_step is not None)
        notes_tf = cfg.teacher_force and ground_truth is not None

        if (
            not inference
            and cfg.fused_train_decoder
            and fused_step is not None
            and cfg.cell_type == "GRU"
            and not merge
            and not notes_tf
            and cfg.num_layers_decoder == 2
            and cfg.activation in ("softmax", "sigmoid", "linear")
        ):
            outputs.update(
                self._decode_multihead_train(dec, new_encoded, B, z.dtype)
            )

        if "notes" not in outputs:
            if merge and not notes_tf:
                merged_specs["notes"] = head_spec(
                    "notes", cfg.output_dim, cfg.activation
                )
            else:
                outputs["notes"] = run_head(
                    "notes", cfg.output_dim, cfg.output_length, cfg.activation,
                    ground_truth if cfg.teacher_force else None,
                )
        if cfg.meta_velocity and "velocity" not in outputs:
            if merge:
                merged_specs["velocity"] = head_spec(
                    "velocity", 1, cfg.meta_velocity_activation
                )
            else:
                outputs["velocity"] = run_head(
                    "velocity", 1, cfg.meta_velocity_length,
                    cfg.meta_velocity_activation, None,
                )
        if cfg.meta_held_notes and "held" not in outputs:
            if merge:
                merged_specs["held"] = head_spec(
                    "held", 2, cfg.meta_held_notes_activation
                )
            else:
                outputs["held"] = run_head(
                    "held", 2, cfg.meta_held_notes_length,
                    cfg.meta_held_notes_activation, None,
                )
        if cfg.meta_next_notes:
            next_tf = cfg.meta_next_notes_teacher_force and next_ground_truth is not None
            if merge and not next_tf:
                merged_specs["next"] = head_spec("next", cfg.output_dim, cfg.activation)
            else:
                outputs["next"] = run_head(
                    "next", cfg.output_dim, cfg.meta_next_notes_output_length,
                    cfg.activation,
                    next_ground_truth if next_tf else None,
                )
        if merged_specs:
            outputs.update(
                decode_heads_merged(
                    merged_specs, cfg.output_length, cfg.cell_type,
                    cfg.lstm_activation, fused_step=fused_step,
                    gate_activation=cfg.gate_activation,
                )
            )
        if cfg.meta_instrument:
            outputs["instrument"] = run_head(
                "instrument",
                cfg.meta_instrument_dim,
                cfg.meta_instrument_length,
                cfg.meta_instrument_activation,
                None,
            )
        return outputs

    # ------------------------------------------------------------------
    # Latent probes
    # ------------------------------------------------------------------
    def composer_logits(self, z: jnp.ndarray) -> jnp.ndarray:
        """softmax-over-slice probe: logits are just z[:, :k]
        (vae_definition.py:730-734)."""
        return z[:, : self.cfg.num_composers]

    def composer_prediction(self, z: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.softmax(self.composer_logits(z), axis=-1)

    def signature_prediction(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        offset = cfg.num_composers if cfg.include_composer_decoder else 0
        act = activation_fn(cfg.signature_activation)
        return act(z[:, offset : offset + cfg.signature_dim])

    def composer_from_notes(self, params: Params, notes_seq: jnp.ndarray) -> jnp.ndarray:
        p = params["composer_at_notes"]
        h = encode_sequence(
            p["rnn"], notes_seq, self.cfg.cell_type, self.cfg.lstm_activation,
            gate_activation=self.cfg.gate_activation,
        )
        return dense_apply(p["out"], h)

    def composer_from_instrument(self, params: Params, inst_seq: jnp.ndarray) -> jnp.ndarray:
        p = params["composer_at_instrument"]
        h = encode_sequence(
            p["rnn"], inst_seq, self.cfg.cell_type, self.cfg.lstm_activation,
            gate_activation=self.cfg.gate_activation,
        )
        return dense_apply(p["out"], h)

    # ------------------------------------------------------------------
    # Full autoencoder forward
    # ------------------------------------------------------------------
    def apply(
        self,
        params: Params,
        batch: dict,
        rng: jax.Array | None = None,
        epsilon_std: float = 0.0,
        noise: jnp.ndarray | None = None,
    ) -> dict:
        """Autoencoder forward: encode, sample, decode all heads + probes.

        With ``cfg.compute_dtype='bfloat16'`` the whole forward runs in bf16
        (MXU 2x rate; matmul accumulation stays f32 via
        preferred_element_type) while the caller's loss upcasts to f32.

        ``noise``: optional PRE-SCALED reparameterization noise
        (epsilon_std * N(0,1), shape (B, latent_dim), z_mean's dtype) --
        z = z_mean + exp(z_log_var/2) * noise. Used by the shard_map'd
        forward (apply_sharded): the noise is drawn OUTSIDE the manual
        region with the same key/shape/dtype sample_z would use, so the
        sharded program is bit-identical to the single-program one."""
        cfg = self.cfg
        if cfg.compute_dtype == "bfloat16":
            bf16 = jnp.bfloat16
            params = jax.tree_util.tree_map(lambda a: a.astype(bf16), params)
            batch = {
                k: (v.astype(bf16) if hasattr(v, "dtype") and v.dtype == jnp.float32 else v)
                for k, v in batch.items()
            }
            if noise is not None:
                noise = noise.astype(bf16)
        z_mean, z_log_var = self.encode_stats(params, batch)
        if noise is not None:
            z = z_mean + jnp.exp(z_log_var / 2.0) * noise
        else:
            z = self.sample_z(z_mean, z_log_var, rng, epsilon_std)
        outputs = self.decode(
            params,
            z,
            history=batch.get("H"),
            additional=batch.get("A"),
            ground_truth=batch.get("Y") if cfg.teacher_force else None,
            next_ground_truth=(
                batch.get("N") if cfg.meta_next_notes_teacher_force else None
            ),
        )
        result = {
            "z_mean": z_mean,
            "z_log_var": z_log_var,
            "z": z,
            "heads": outputs,
        }
        if cfg.include_composer_decoder:
            result["composer_logits"] = self.composer_logits(z)
        if cfg.signature_decoder:
            result["signature"] = self.signature_prediction(z)
        if cfg.composer_decoder_at_notes_output:
            result["composer_at_notes_logits"] = self.composer_from_notes(
                params, outputs["notes"][0]
            )
        if cfg.composer_decoder_at_instrument_output:
            result["composer_at_instrument_logits"] = self.composer_from_instrument(
                params, outputs["instrument"][0]
            )
        return result


# ---------------------------------------------------------------------------
# SPMD dispatch: manual-over-'data' forward for multi-chip meshes
# ---------------------------------------------------------------------------
# GSPMD cannot auto-partition Mosaic (Pallas) kernels -- a multi-chip TPU
# mesh with the fused kernels enabled fails to compile ("Mosaic kernels
# cannot be automatically partitioned"). The forward is per-row over the
# batch, so the fix is exact: run model.apply / model.encode inside
# jax.shard_map, manual over the 'data' axis (each chip's kernels see the
# local batch shard) and auto over 'model' (GSPMD keeps tensor-parallel
# layouts). All batch reductions (losses, metrics) happen OUTSIDE on the
# sharded outputs, so the math -- and, with the reparameterization noise
# drawn outside the manual region, the bits -- match the single-program
# dispatch. AD composes: replicated params get their cotangents psum'd
# over 'data' by shard_map's transpose, which IS the DP gradient
# all-reduce.


def _data_manual(model: MidiVAE, n_rows: int):
    """(mesh, manual axis names) to shard_map over, or (None, None) for
    plain dispatch. Rows that do not divide the 'data' axis (host-path
    partial batches) take the plain dispatch -- the jitted trainer paths
    always pad to full batches.

    DP-only meshes go FULLY manual (every axis named): Mosaic kernels
    cannot appear under any auto mesh axis, and with model=1 there is
    nothing for GSPMD to do inside. Tensor-parallel meshes stay manual
    over 'data' only, leaving 'model' to GSPMD -- the kernels are then
    disabled (_pallas_enabled) and the scan path partitions cleanly."""
    mesh = model.mesh
    if mesh is None or mesh.shape.get("data", 1) <= 1:
        return None, None
    if n_rows % mesh.shape["data"] != 0:
        return None, None
    if mesh.shape.get("model", 1) == 1:
        return mesh, set(mesh.axis_names)
    return mesh, {"data"}


def apply_sharded(
    model: MidiVAE, params: Params, batch: dict, rng, epsilon_std: float
) -> dict:
    """model.apply, shard_map'd over the mesh 'data' axis when one is set."""
    mesh, manual = _data_manual(model, batch["X"].shape[0])
    if mesh is None:
        return model.apply(params, batch, rng, epsilon_std)
    from jax.sharding import PartitionSpec as P

    cfg = model.cfg
    batch_specs = {k: P("data") for k in batch}
    if rng is not None and epsilon_std != 0.0:
        dt = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        # same key / shape / dtype / scaling as sample_z would use inside
        noise = epsilon_std * jax.random.normal(
            rng, (batch["X"].shape[0], cfg.latent_dim), dt
        )
        fn = jax.shard_map(
            lambda p, b, nz: model.apply(p, b, None, 0.0, noise=nz),
            mesh=mesh, axis_names=manual, check_vma=False,
            in_specs=(P(), batch_specs, P("data")), out_specs=P("data"),
        )
        return fn(params, batch, noise)
    fn = jax.shard_map(
        lambda p, b: model.apply(p, b, None, 0.0),
        mesh=mesh, axis_names=manual, check_vma=False,
        in_specs=(P(), batch_specs), out_specs=P("data"),
    )
    return fn(params, batch)


def encode_sharded(
    model: MidiVAE, params: Params, batch: dict
) -> jnp.ndarray:
    """Deterministic model.encode, shard_map'd over 'data' when set."""
    mesh, manual = _data_manual(model, batch["X"].shape[0])
    if mesh is None:
        return model.encode(params, batch)
    from jax.sharding import PartitionSpec as P

    batch_specs = {k: P("data") for k in batch}
    fn = jax.shard_map(
        lambda p, b: model.encode(p, b),
        mesh=mesh, axis_names=manual, check_vma=False,
        in_specs=(P(), batch_specs), out_specs=P("data"),
    )
    return fn(params, batch)


# ---------------------------------------------------------------------------
# Loss: the single fused objective
# ---------------------------------------------------------------------------

def _xent_from_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-element categorical crossentropy -sum(y * log_softmax(logits))."""
    return -jnp.sum(targets * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def kl_divergence(
    z_mean: jnp.ndarray,
    z_log_var: jnp.ndarray,
    prior_mean: float,
    prior_std: float,
) -> jnp.ndarray:
    """Per-sample KL( N(mu, sigma) || N(prior) ), summed over latent dims
    (vae_definition.py:29-36, unscaled by beta)."""
    prior_log_var = 2.0 * jnp.log(prior_std)
    prior_var = prior_std * prior_std
    return -0.5 * jnp.sum(
        1.0
        + z_log_var
        - prior_log_var
        - ((z_mean - prior_mean) ** 2 + jnp.exp(z_log_var)) / prior_var,
        axis=-1,
    )


def loss_and_metrics(
    model: MidiVAE,
    params: Params,
    batch: dict,
    rng: jax.Array | None,
    epsilon_std: float,
    return_z: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """Total loss = sum(weight_i * head_loss_i) + beta * KL, replicating the
    Keras compile structure (vae_definition.py:332-441) and its weighted
    temporal sample weighting for the notes head (silent_weight,
    vae_definition.py:929-933).

    Returns (total_loss, metrics dict of per-head losses + accuracies).
    ``return_z`` adds the batch's z_mean under the non-scalar key "_z" --
    callers must pop it before averaging (the trainer's history-z cache).
    """
    cfg = model.cfg
    out = apply_sharded(model, params, batch, rng, epsilon_std)
    if cfg.compute_dtype == "bfloat16":
        # losses/metrics in full precision
        out = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32) if hasattr(a, "dtype") else a, out
        )
    metrics: dict[str, jnp.ndarray] = {}
    total = jnp.zeros((), jnp.float32)

    # optional per-sample validity mask "M" (B,) -- 0-rows are jit padding
    M = batch.get("M")

    def bmean(x: jnp.ndarray) -> jnp.ndarray:
        """Mean over all elements, restricted to valid batch rows."""
        if M is None:
            return jnp.mean(x)
        m = M.reshape(M.shape[0], *([1] * (x.ndim - 1)))
        per_sample = 1.0
        for d in x.shape[1:]:
            per_sample *= d
        denom = jnp.maximum(jnp.sum(M) * per_sample, 1e-8)
        return jnp.sum(x * m) / denom

    # --- notes head: temporal-weighted vae_loss (vae_definition.py:338;
    # 'categorical_crossentropy' as shipped, 'mse' selectable) ---
    probs, logits = out["heads"]["notes"]
    Y = batch["Y"]
    if cfg.vae_loss in ("mse", "mean_squared_error"):
        # Keras mse on a (B,T,D) output: per-timestep mean over D, then the
        # same temporal sample weighting as the crossentropy path
        xent = jnp.mean((probs - Y) ** 2, axis=-1)  # (B, T)
    else:
        xent = _xent_from_logits(logits, Y)  # (B, T)
    if cfg.include_silent_note and cfg.silent_weight != 1.0:
        w = jnp.where(Y[..., -1] == 1, cfg.silent_weight, 1.0)
        nonzero = bmean((w != 0).astype(jnp.float32))
        notes_loss = bmean(xent * w) / jnp.maximum(nonzero, 1e-8)
    else:
        notes_loss = bmean(xent)
    notes_acc = bmean(
        (jnp.argmax(probs, axis=-1) == jnp.argmax(Y, axis=-1)).astype(jnp.float32)
    )
    metrics["notes_loss"] = notes_loss
    metrics["notes_acc"] = notes_acc
    total = total + 1.0 * notes_loss

    if cfg.meta_instrument:
        probs_i, logits_i = out["heads"]["instrument"]
        I = batch["I"]
        loss_i = bmean(_xent_from_logits(logits_i, I))
        acc_i = bmean(
            (jnp.argmax(probs_i, -1) == jnp.argmax(I, -1)).astype(jnp.float32)
        )
        metrics["meta_instrument_loss"] = loss_i
        metrics["meta_instrument_acc"] = acc_i
        total = total + cfg.meta_instrument_weight * loss_i

    if cfg.meta_velocity:
        probs_v, _ = out["heads"]["velocity"]
        V = batch["V"]
        loss_v = bmean((probs_v - V) ** 2)
        # Keras-2.0.8 binary_accuracy on a regression head (SURVEY.md §2.1):
        # mean(equal(y_true, round(y_pred))) -- y_true is NOT rounded, so a
        # continuous played-note velocity only ever scores when the target
        # is exactly 0 or 1 (the reference's actual, quirky, training curve)
        acc_v = bmean((jnp.round(probs_v) == V).astype(jnp.float32))
        metrics["meta_velocity_loss"] = loss_v
        metrics["meta_velocity_acc"] = acc_v
        total = total + cfg.meta_velocity_weight * loss_v

    if cfg.meta_held_notes:
        probs_d, logits_d = out["heads"]["held"]
        D = batch["D"]
        loss_d = bmean(_xent_from_logits(logits_d, D))
        acc_d = bmean(
            (jnp.argmax(probs_d, -1) == jnp.argmax(D, -1)).astype(jnp.float32)
        )
        metrics["meta_held_notes_loss"] = loss_d
        metrics["meta_held_notes_acc"] = acc_d
        total = total + cfg.meta_held_notes_weight * loss_d

    if cfg.meta_next_notes:
        probs_n, logits_n = out["heads"]["next"]
        N = batch["N"]
        loss_n = bmean(_xent_from_logits(logits_n, N))
        acc_n = bmean(
            (jnp.argmax(probs_n, -1) == jnp.argmax(N, -1)).astype(jnp.float32)
        )
        metrics["meta_next_notes_loss"] = loss_n
        metrics["meta_next_notes_acc"] = acc_n
        total = total + cfg.meta_next_notes_weight * loss_n

    if cfg.include_composer_decoder:
        C = batch["C"]
        comp_xent = _xent_from_logits(out["composer_logits"], C)
        loss_c = bmean(comp_xent)
        acc_c = bmean(
            (jnp.argmax(out["composer_logits"], -1) == jnp.argmax(C, -1)).astype(
                jnp.float32
            )
        )
        metrics["composer_loss"] = loss_c
        metrics["composer_acc"] = acc_c
        total = total + cfg.composer_weight * loss_c

    if cfg.signature_decoder:
        S = batch["S"]
        loss_s = bmean((out["signature"] - S) ** 2)
        metrics["signature_loss"] = loss_s
        total = total + cfg.signature_weight * loss_s

    if cfg.composer_decoder_at_notes_output:
        C = batch["C"]
        loss_cn = bmean(_xent_from_logits(out["composer_at_notes_logits"], C))
        metrics["composer_at_notes_loss"] = loss_cn
        total = total + cfg.composer_decoder_at_notes_weight * loss_cn

    if cfg.composer_decoder_at_instrument_output:
        C = batch["C"]
        loss_ci = bmean(
            _xent_from_logits(out["composer_at_instrument_logits"], C)
        )
        metrics["composer_at_instrument_loss"] = loss_ci
        total = total + cfg.composer_decoder_at_instrument_weight * loss_ci

    # --- KL (the reference's add_loss term, beta inside) ---
    log_var = out["z_log_var"]
    if cfg.epsilon_factor > 0:
        log_var = log_var + cfg.epsilon_factor
    kl = bmean(kl_divergence(out["z_mean"], log_var, cfg.prior_mean, cfg.prior_std))
    metrics["kl_loss"] = kl
    total = total + cfg.beta * kl

    metrics["loss"] = total
    if return_z:
        metrics["_z"] = out["z_mean"]
    return total, metrics

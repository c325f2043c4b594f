"""Sequence RNN encoders and autoregressive decode scans.

This module is the TPU-native replacement for the reference's two recurrent
engines:

* Keras ``GRU/LSTM/SimpleRNN(return_sequences=...)`` encoder stacks
  (/root/reference/vae_definition.py:443-480) become ``encode_sequence``;
  on training paths a whole layer (forward AND backward) is one Pallas
  kernel with the input projection computed in-kernel (ops/fused_train),
  on inference paths a whole-layer forward kernel over the batched
  projection, otherwise a ``jax.lax.scan`` over per-step cells,
* recurrentshop's ``RecurrentModel(decode=True, readout_input=...,
  teacher_force=...)`` readout decoders (vae_definition.py:519-728) become
  ``decode_autoregressive``: a scan whose carry holds the per-layer states
  and the previous output, which is fed back as the next input (softmax
  probabilities, matching the reference's feedback of activation outputs);
  teacher forcing swaps the feedback for the shifted ground truth. Wide
  heads take whole-head kernels instead (models/vae.py run_head ->
  ops/fused_train.gru_decode_train / ops/fused_decoder.fused_decode_scan).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .cells import (
    activation_fn,
    dense_apply,
    gate_activation_fn,
    get_cell,
    zero_states,
)

Params = dict[str, Any]


def encode_sequence(
    layer_params: list[Params],
    xs: jnp.ndarray,
    cell_type: str,
    activation: str = "tanh",
    bidirectional: bool = False,
    fused: bool = False,
    whole_scan: bool = False,
    fused_train: bool = True,
    inference: bool = False,
    gate_activation: str = "sigmoid",
    interpret: bool = False,
) -> jnp.ndarray:
    """Run a stacked RNN over (B, T, D); return last layer's final state (B, H).

    Mirrors the reference encoder stack: all layers but the last return
    sequences; the final layer returns its last hidden state
    (vae_definition.py:455-461). ``bidirectional`` wraps the non-final
    layers in forward+backward passes with concat merge
    (vae_definition.py:447-453).

    ``interpret``: run the Pallas kernels in interpret mode (CPU tests of
    the kernel-dispatch glue, MidiVAE._interpret).
    """
    cell = get_cell(cell_type)
    # the Pallas kernels implement exact-sigmoid gates only
    fused = fused and cell_type in ("GRU", "LSTM") and gate_activation == "sigmoid"
    whole_scan = whole_scan and fused

    h = xs
    n_layers = len(layer_params)
    for i, p in enumerate(layer_params):
        is_last = i == n_layers - 1
        if bidirectional and not is_last:
            fwd = _scan_layer(
                cell, p["fwd"], h, activation, True, fused, whole_scan,
                fused_train, inference, gate_activation, interpret,
            )
            bwd = _scan_layer(
                cell, p["bwd"], h[:, ::-1, :], activation, True, fused,
                whole_scan, fused_train, inference, gate_activation, interpret,
            )[:, ::-1, :]
            h = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            h = _scan_layer(
                cell, p, h, activation, not is_last, fused, whole_scan,
                fused_train, inference, gate_activation, interpret,
            )
    return h


def _scan_layer(
    cell, p: Params, xs: jnp.ndarray, activation: str, return_sequences: bool,
    fused: bool = False, whole_scan: bool = False, fused_train: bool = True,
    inference: bool = False, gate_activation: str = "sigmoid",
    interpret: bool = False,
):
    """One RNN layer over (B, T, D).

    Dispatch (fastest first):
      * inference: ONE whole-layer forward kernel with the x-projection
        computed in-kernel (ops/fused_train ``*_layer_infer_x`` -- no
        (T,B,gates) xp materialized in HBM, no time-major transpose of it;
        rs=False layers emit only the final h),
      * training with ``fused_train`` (default): ONE whole-layer Pallas
        kernel each way with the x-projection computed in-kernel
        (ops/fused_train ``*_layer_train_x``),
      * ``whole_scan`` without ``inference`` (bf16 with train kernels
        disabled): whole-layer forward kernels over the precomputed
        x-projection, remat backward (ops/fused_decoder / ops/fused_lstm),
      * ``fused`` without train kernels: per-step Pallas kernels inside a
        lax.scan,
      * otherwise: the plain jnp cell scan."""
    act = activation_fn(activation)
    gact = gate_activation_fn(gate_activation)
    B, T, _D = xs.shape
    hidden = p["u"].shape[0]
    init = zero_states(cell, B, hidden, xs.dtype)

    if fused and inference:
        # inference: in-kernel projection forward, no residuals, no xp HBM
        if cell.num_states == 2:  # LSTM
            from ..ops.fused_train import lstm_layer_infer_x

            out = lstm_layer_infer_x(
                jnp.swapaxes(xs, 0, 1), init[0], init[1], p["w"], p["b"],
                p["u"], activation, return_sequences, interpret,
            )
        else:
            from ..ops.fused_train import gru_layer_infer_x

            out = gru_layer_infer_x(
                jnp.swapaxes(xs, 0, 1), init[0], p["w"], p["b"], p["u"],
                activation, return_sequences, interpret,
            )
        if return_sequences:
            return jnp.swapaxes(out, 0, 1)
        return out

    if fused and fused_train and not whole_scan:
        # training path: whole-layer kernels BOTH ways with IN-KERNEL
        # x-projection (W/b resident in VMEM, x@W per step on the MXU) --
        # no (T,B,gates) materialization in HBM at all. The step is
        # HBM-bandwidth-bound, so this is the dominant win.
        if cell.num_states == 2:  # LSTM
            from ..ops.fused_train import lstm_layer_train_x

            out = lstm_layer_train_x(
                jnp.swapaxes(xs, 0, 1), init[0], init[1], p["w"], p["b"],
                p["u"], activation, return_sequences, interpret,
            )
        else:
            from ..ops.fused_train import gru_layer_train_x

            out = gru_layer_train_x(
                jnp.swapaxes(xs, 0, 1), init[0], p["w"], p["b"], p["u"],
                activation, return_sequences, interpret,
            )
        if return_sequences:
            return jnp.swapaxes(out, 0, 1)
        return out

    # (B, T, gates) in one matmul -- the MXU-friendly layout
    xp = cell.x_proj(p, xs.reshape(B * T, -1)).reshape(B, T, -1)

    if whole_scan:
        if cell.num_states == 2:  # LSTM
            from ..ops.fused_lstm import fused_lstm_encoder_scan

            out = fused_lstm_encoder_scan(
                jnp.swapaxes(xp, 0, 1), init[0], init[1], p["u"], activation,
                return_sequences, interpret,
            )
        else:
            from ..ops.fused_decoder import fused_encoder_scan

            out = fused_encoder_scan(
                jnp.swapaxes(xp, 0, 1), init[0], p["u"], activation,
                return_sequences, interpret,
            )
        if return_sequences:
            return jnp.swapaxes(out, 0, 1)
        return out

    if fused and cell.num_states == 2:  # LSTM per-step
        from ..ops.fused_lstm import lstm_recurrent_step

        def step(states, xp_t):
            h, c = states
            new_h, new_c = lstm_recurrent_step(
                xp_t, h, c, p["u"], activation, interpret
            )
            return (new_h, new_c), (new_h if return_sequences else None)

    elif fused:
        from ..ops.fused_gru import gru_recurrent_step

        def step(states, xp_t):
            (h,) = states
            new_h = gru_recurrent_step(xp_t, h, p["u"], activation, interpret)
            return (new_h,), (new_h if return_sequences else None)

    else:

        def step(states, xp_t):
            out, new_states = cell.step(p, xp_t, states, act, gact)
            return new_states, (out if return_sequences else None)

    final_states, outs = jax.lax.scan(step, init, jnp.swapaxes(xp, 0, 1))
    if return_sequences:
        return jnp.swapaxes(outs, 0, 1)
    return final_states[0]  # h of the last step


# ---------------------------------------------------------------------------
# Autoregressive decoding
# ---------------------------------------------------------------------------

def init_decoder_states(
    init_dense: list[Params],
    new_encoded: jnp.ndarray,
    cell_type: str,
    state_activation: str,
) -> tuple[tuple, ...]:
    """Per-layer initial states = Dense(tanh)([z ⊕ history ⊕ ...])
    (vae_definition.py:558-570). ``init_dense`` is flat: num_layers *
    num_states dense params, layer-major."""
    cell = get_cell(cell_type)
    act = activation_fn(state_activation)
    states: list[tuple] = []
    i = 0
    n_layers = len(init_dense) // cell.num_states
    for _layer in range(n_layers):
        layer_states = []
        for _s in range(cell.num_states):
            layer_states.append(act(dense_apply(init_dense[i], new_encoded)))
            i += 1
        states.append(tuple(layer_states))
    return tuple(states)


def decode_autoregressive(
    cell_params: list[Params],
    out_dense: Params,
    initial_states: tuple[tuple, ...],
    start: jnp.ndarray,
    output_length: int,
    cell_type: str,
    lstm_activation: str = "tanh",
    out_activation: str = "softmax",
    ground_truth: jnp.ndarray | None = None,
    fused_step=None,
    gate_activation: str = "sigmoid",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Readout decode loop: output_t feeds back as input_{t+1}.

    Args:
      cell_params: per-layer cell params (stacked cells inside one step).
      out_dense: the Dense head producing the per-step output.
      initial_states: per-layer state tuples from ``init_decoder_states``.
      start: (B, out_dim) start symbol = input of step 0
        (``initial_readout``, vae_definition.py:570).
      ground_truth: optional (B, T, out_dim); when given, step t>0 consumes
        ground_truth[t-1] instead of the previous output (teacher forcing).

    Returns:
      (probs, logits): both (B, T, out_dim); probs = out_activation(logits)
      (the feedback signal), logits for numerically-stable losses.
    """
    cell = get_cell(cell_type)
    act = activation_fn(lstm_activation)
    gact = gate_activation_fn(gate_activation)
    out_act = activation_fn(out_activation)
    if gate_activation != "sigmoid":
        fused_step = None  # Pallas steps implement exact-sigmoid gates only

    if ground_truth is not None:
        # teacher forcing: inputs are known ahead of time -> plain scan over
        # [start, gt[0], ..., gt[T-2]]
        inputs = jnp.concatenate(
            [start[:, None, :], ground_truth[:, :-1, :]], axis=1
        )

        def tf_step(states, x_t):
            out = x_t
            new_states = []
            for p, s in zip(cell_params, states):
                xp = cell.x_proj(p, out)
                out, ns = cell.step(p, xp, s, act, gact)
                new_states.append(ns)
            logits = dense_apply(out_dense, out)
            return tuple(new_states), logits

        _, logits = jax.lax.scan(
            tf_step, initial_states, jnp.swapaxes(inputs, 0, 1)
        )
        logits = jnp.swapaxes(logits, 0, 1)
        return out_act(logits), logits

    def ar_step(carry, _):
        states, prev_out = carry
        out = prev_out
        new_states = []
        for p, s in zip(cell_params, states):
            if fused_step is not None:
                out, ns = fused_step(p, out, s)
            else:
                xp = cell.x_proj(p, out)
                out, ns = cell.step(p, xp, s, act, gact)
            new_states.append(ns)
        logits = dense_apply(out_dense, out)
        probs = out_act(logits)
        return (tuple(new_states), probs), (probs, logits)

    (_, _), (probs, logits) = jax.lax.scan(
        ar_step, (initial_states, start), None, length=output_length
    )
    return jnp.swapaxes(probs, 0, 1), jnp.swapaxes(logits, 0, 1)


def decode_heads_merged(
    heads: dict,
    output_length: int,
    cell_type: str,
    lstm_activation: str = "tanh",
    fused_step=None,
    gate_activation: str = "sigmoid",
) -> dict:
    """Run several independent readout decoders in ONE ``lax.scan``.

    The reference runs one RecurrentModel per head, back to back
    (vae_definition.py:519-728); as separate scans the heads serialize on
    TPU, paying per-step scheduling overhead 3-4x. The heads share no state,
    so a single scan whose carry holds every head's (states, prev_out) is
    mathematically identical while letting XLA overlap their per-step work.

    heads: name -> dict(cells=[...], out=dense, init_states=..., start=...,
                        out_activation=str). All heads must have the same
    sequence length. Returns name -> (probs, logits), each (B, T, dim).
    """
    cell = get_cell(cell_type)
    act = activation_fn(lstm_activation)
    gact = gate_activation_fn(gate_activation)
    if gate_activation != "sigmoid":
        fused_step = None  # Pallas steps implement exact-sigmoid gates only
    names = list(heads)
    out_acts = {n: activation_fn(heads[n]["out_activation"]) for n in names}

    init_carry = tuple(
        (heads[n]["init_states"], heads[n]["start"]) for n in names
    )

    def step(carry, _):
        new_carry = []
        outs = []
        for n, (states, prev_out) in zip(names, carry):
            spec = heads[n]
            out = prev_out
            new_states = []
            for p, s in zip(spec["cells"], states):
                if fused_step is not None:
                    out, ns = fused_step(p, out, s)
                else:
                    xp = cell.x_proj(p, out)
                    out, ns = cell.step(p, xp, s, act, gact)
                new_states.append(ns)
            logits = dense_apply(spec["out"], out)
            probs = out_acts[n](logits)
            new_carry.append((tuple(new_states), probs))
            outs.append((probs, logits))
        return tuple(new_carry), tuple(outs)

    _, scanned = jax.lax.scan(step, init_carry, None, length=output_length)
    result = {}
    for i, n in enumerate(names):
        probs, logits = scanned[i]
        result[n] = (jnp.swapaxes(probs, 0, 1), jnp.swapaxes(logits, 0, 1))
    return result

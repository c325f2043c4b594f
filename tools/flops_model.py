"""Analytic matmul FLOPs for one training step of the MIDI-VAE model.

XLA's ``compiled.cost_analysis()`` cannot see inside Pallas custom calls,
so its per-step FLOP counts swing wildly with which decode-head kernel mode
a geometry admits (measured: 1.4 GFLOP at B=256 vs 98 GFLOP at B=512 for a
2x workload). The MFU table therefore uses THIS model-derived count: every
matmul in the architecture (mirroring ``MidiVAE._init_params_impl``,
midi_vae_tpu/models/vae.py:97-207, and the sequence lengths of the batch
layout, data/batching.py), counted as 2*M*N*K forward; the backward pass
costs 2x forward (dX = dY @ W^T and dW = X^T @ dY per matmul), so a
training step is 3x the forward count. Elementwise ops, the KL term, and
the Adam update are excluded (<1% at these geometries).

The resulting count is a lower bound on device work (any recompute or
padding in a kernel only adds), which makes the reported MFU a lower bound
too -- the honest direction.
"""

from __future__ import annotations


def _gru_gates(cell_type: str) -> int:
    return 4 if cell_type.lower() == "lstm" else 3


def _rnn_stack_flops(
    B: int, T: int, in_dim: int, H: int, n_layers: int,
    bidirectional: bool, gates: int,
) -> float:
    """Forward matmul FLOPs of a rnn_stack (vae.py:104-120): per step each
    cell does x @ W (in,gH) + h @ U (H,gH)."""
    total = 0.0
    d = in_dim
    for i in range(n_layers):
        is_last = i == n_layers - 1
        per_cell = 2.0 * B * T * (d * gates * H + H * gates * H)
        if bidirectional and not is_last:
            total += 2 * per_cell
            d = 2 * H
        else:
            total += per_cell
            d = H
    return total


def _dense_flops(B: int, in_dim: int, out_dim: int) -> float:
    return 2.0 * B * in_dim * out_dim


def forward_flops(cfg) -> dict[str, float]:
    """Per-component forward matmul FLOPs for one batch at cfg geometry."""
    B = cfg.batch_size
    H = cfg.lstm_size
    g = _gru_gates(cfg.cell_type)
    T_in, T_out = cfg.input_length, cfg.output_length
    mv = cfg.max_voices
    parts: dict[str, float] = {}

    # ---- encoder ----
    enc_in = cfg.embedding_dim if cfg.use_embedding else cfg.input_dim
    enc = 0.0
    if cfg.use_embedding:
        enc += 2.0 * B * T_in * cfg.input_dim * cfg.embedding_dim
    enc += _rnn_stack_flops(
        B, T_in, enc_in, H, cfg.num_layers_encoder, cfg.bidirectional, g
    )
    n_meta = 0
    if cfg.meta_instrument:
        enc += _rnn_stack_flops(B, mv, cfg.meta_instrument_dim, H, 1, False, g)
        n_meta += 1
    if cfg.meta_velocity:
        vel_in = 3 if cfg.combine_velocity_and_held_notes else 1
        enc += _rnn_stack_flops(B, T_out, vel_in, H, 1, False, g)
        n_meta += 1
    if cfg.meta_held_notes and not cfg.combine_velocity_and_held_notes:
        enc += _rnn_stack_flops(B, T_out, 2, H, 1, False, g)
        n_meta += 1
    if n_meta:
        enc += _dense_flops(B, H * (1 + n_meta), H)  # fusion
    if cfg.extra_layer:
        enc += _dense_flops(B, H, H)
    half = H // 2 if cfg.split_lstm_vector else H
    enc += 2 * _dense_flops(B, half, cfg.latent_dim)  # z_mean + z_log_var
    parts["encoder"] = enc

    # ---- decoder heads ----
    new_dim = cfg.latent_dim
    if cfg.history:
        new_dim += cfg.latent_dim
    if cfg.decoder_additional_input:
        new_dim += cfg.decoder_additional_input_dim
    num_states = 2 if cfg.cell_type.lower() == "lstm" else 1

    def head(T: int, D: int, n_layers: int) -> float:
        f = n_layers * num_states * _dense_flops(B, new_dim, H)  # state init
        d = D  # feedback input: previous output, width D
        for _ in range(n_layers):
            f += 2.0 * B * T * (d * g * H + H * g * H)
            d = H
        f += 2.0 * B * T * H * D  # per-step output dense
        return f

    parts["dec_notes"] = head(T_out, cfg.output_dim, cfg.num_layers_decoder)
    if cfg.meta_instrument:
        parts["dec_instrument"] = head(mv, cfg.meta_instrument_dim, 1)
    if cfg.meta_velocity:
        vel_out = 3 if cfg.combine_velocity_and_held_notes else 1
        parts["dec_velocity"] = head(T_out, vel_out, 1)
    if cfg.meta_held_notes and not cfg.combine_velocity_and_held_notes:
        parts["dec_held"] = head(T_out, 2, 1)
    if cfg.meta_next_notes:
        parts["dec_next"] = head(T_out, cfg.output_dim, cfg.num_layers_decoder)

    # ---- probes ----
    probes = 0.0
    if cfg.include_composer_decoder:
        probes += _dense_flops(B, cfg.latent_dim, cfg.num_composers)
    if cfg.signature_decoder:
        probes += _dense_flops(B, cfg.latent_dim, cfg.signature_vector_length)
    if cfg.composer_decoder_at_notes_output:
        probes += _rnn_stack_flops(B, T_out, cfg.output_dim, H, 1, False, g)
        probes += _dense_flops(B, H, cfg.num_composers)
    if cfg.composer_decoder_at_instrument_output:
        probes += _rnn_stack_flops(B, mv, cfg.meta_instrument_dim, H, 1, False, g)
        probes += _dense_flops(B, H, cfg.num_composers)
    if probes:
        parts["probes"] = probes
    return parts


def train_step_flops(cfg) -> float:
    """Total matmul FLOPs of one optimizer step (forward + backward = 3x
    forward)."""
    return 3.0 * sum(forward_flops(cfg).values())


if __name__ == "__main__":
    import argparse
    import json
    import sys

    sys.path.insert(0, ".")
    from midi_vae_tpu.config import Config

    ap = argparse.ArgumentParser()
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()
    from midi_vae_tpu.config import parse_overrides

    overrides = parse_overrides(args.set)
    cfg = Config(**overrides)
    parts = forward_flops(cfg)
    out = {
        "per_component_fwd_gflop": {k: round(v / 1e9, 3) for k, v in parts.items()},
        "fwd_gflop": round(sum(parts.values()) / 1e9, 3),
        "train_step_gflop": round(train_step_flops(cfg) / 1e9, 3),
    }
    print(json.dumps(out))

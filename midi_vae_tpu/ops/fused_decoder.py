"""Pallas TPU kernel: the WHOLE autoregressive decode scan in one kernel.

``fused_gru.gru_step`` fuses one recurrent step; this module goes further and
fuses the entire readout decode loop of a head (vae_definition.py:519-570's
RecurrentModel semantics): the TPU grid's sequential execution is the time
loop, the cell weights and output Dense live in VMEM for ALL steps, and the
carried state (h per layer + the fed-back probabilities) persists in scratch
across grid steps -- zero per-step dispatch, zero HBM traffic for weights
after the first load.

Supports 1- and 2-layer GRU heads (the reference's decoder configurations:
notes/next = num_layers_decoder(2), instrument/velocity/held = 1).

Differentiable via custom VJP: backward re-runs the pure-jnp scan
(rematerialization) and transposes through it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fused_gru import _activation


def _decoder_vmem_ok(
    B: int, D: int, H: int, n_layers: int, itemsize: int = 4
) -> bool:
    # operand-dtype residents at the operands' itemsize (bf16 halves them,
    # admitting wider layers); f32 gate temporaries at 4 bytes. Ceiling
    # calibrated on chip: VERIFIED to compile and match the reference at
    # (B=256, D=61, H=512, 2 layers) f32 on the v5e, where the formula
    # gives 17.4 MB (the headroom terms overcount).
    operand = (
        D * 3 * H + 3 * H              # W1/b1
        + (n_layers - 1) * (H * 3 * H + 3 * H)  # W2/b2
        + n_layers * H * 3 * H         # U
        + H * D + D                    # out dense
        + n_layers * B * H             # h scratch
        + B * D * 3                    # x scratch + out block + logits block
    )
    f32 = 4 * B * 3 * H                # gate temporaries headroom
    return operand * itemsize + f32 * 4 < 17_500_000


def _gru_gates(x, h, w, u, b, act):
    H = h.shape[-1]
    xw = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
    hu_zr = jnp.dot(h, u[:, : 2 * H], preferred_element_type=jnp.float32)
    z = jax.nn.sigmoid(xw[:, :H] + hu_zr[:, :H])
    r = jax.nn.sigmoid(xw[:, H : 2 * H] + hu_zr[:, H:])
    hh = act(
        xw[:, 2 * H :]
        + jnp.dot(r * h, u[:, 2 * H :], preferred_element_type=jnp.float32)
    )
    return z * h + (1.0 - z) * hh


def _decode_kernel_2layer(
    x0_ref, h1_ref, h2_ref,
    w1_ref, u1_ref, b1_ref, w2_ref, u2_ref, b2_ref, wo_ref, bo_ref,
    probs_ref, logits_ref,
    h1_s, h2_s, x_s,
    *, act, out_act_name,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h1_s[:] = h1_ref[:]
        h2_s[:] = h2_ref[:]
        x_s[:] = x0_ref[:]

    x = x_s[:]
    h1 = _gru_gates(x, h1_s[:], w1_ref[:], u1_ref[:], b1_ref[:], act)
    h2 = _gru_gates(h1, h2_s[:], w2_ref[:], u2_ref[:], b2_ref[:], act)
    logits = jnp.dot(h2, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:]
    if out_act_name == "softmax":
        probs = jax.nn.softmax(logits, axis=-1)
    elif out_act_name == "sigmoid":
        probs = jax.nn.sigmoid(logits)
    else:
        probs = logits
    probs_ref[0] = probs.astype(probs_ref.dtype)
    logits_ref[0] = logits.astype(logits_ref.dtype)
    h1_s[:] = h1.astype(h1_s.dtype)
    h2_s[:] = h2.astype(h2_s.dtype)
    x_s[:] = probs.astype(x_s.dtype)


def _decode_kernel_1layer(
    x0_ref, h1_ref,
    w1_ref, u1_ref, b1_ref, wo_ref, bo_ref,
    probs_ref, logits_ref,
    h1_s, x_s,
    *, act, out_act_name,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h1_s[:] = h1_ref[:]
        x_s[:] = x0_ref[:]

    x = x_s[:]
    h1 = _gru_gates(x, h1_s[:], w1_ref[:], u1_ref[:], b1_ref[:], act)
    logits = jnp.dot(h1, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:]
    if out_act_name == "softmax":
        probs = jax.nn.softmax(logits, axis=-1)
    elif out_act_name == "sigmoid":
        probs = jax.nn.sigmoid(logits)
    else:
        probs = logits
    probs_ref[0] = probs.astype(probs_ref.dtype)
    logits_ref[0] = logits.astype(logits_ref.dtype)
    h1_s[:] = h1.astype(h1_s.dtype)
    x_s[:] = probs.astype(x_s.dtype)


def _decode_scan_reference(cell_params, out_dense, init_states, start, T, act, out_act):
    """Pure-jnp equivalent scan (also the VJP backward path)."""

    def step(carry, _):
        states, prev = carry
        x = prev
        new_states = []
        for p, h in zip(cell_params, states):
            # preferred_element_type upcasts to f32; keep the carry dtype
            x = _gru_gates(x, h, p["w"], p["u"], p["b"], act).astype(h.dtype)
            new_states.append(x)
        logits = x @ out_dense["w"] + out_dense["b"]
        probs = out_act(logits).astype(prev.dtype)
        return (tuple(new_states), probs), (probs, logits)

    (_, _), (probs, logits) = jax.lax.scan(
        step, (tuple(init_states), start), None, length=T
    )
    return probs, logits  # (T, B, D)


def _decode_scan_pallas(
    cell_params, out_dense, init_states, start, T, activation, out_activation,
    interpret,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    n_layers = len(cell_params)
    B, D = start.shape
    H = init_states[0].shape[-1]

    grid = (T,)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    def outspec():
        return pl.BlockSpec((1, B, D), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((T, B, D), start.dtype),
        jax.ShapeDtypeStruct((T, B, D), start.dtype),
    )
    if n_layers == 2:
        kernel = functools.partial(
            _decode_kernel_2layer, act=act, out_act_name=out_activation
        )
        inputs = (
            start, init_states[0], init_states[1],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            cell_params[1]["w"], cell_params[1]["u"], cell_params[1]["b"],
            out_dense["w"], out_dense["b"],
        )
        scratch = [
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, D), start.dtype),
        ]
    else:
        kernel = functools.partial(
            _decode_kernel_1layer, act=act, out_act_name=out_activation
        )
        inputs = (
            start, init_states[0],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            out_dense["w"], out_dense["b"],
        )
        scratch = [
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, D), start.dtype),
        ]

    probs, logits = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=[vm] * len(inputs),
        out_specs=(outspec(), outspec()),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    return probs, logits


def decoder_scan_supported(cell_params, start, init_states) -> bool:
    n_layers = len(cell_params)
    if n_layers not in (1, 2):
        return False
    B, D = start.shape
    H = init_states[0].shape[-1]
    return _decoder_vmem_ok(B, D, H, n_layers, start.dtype.itemsize)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_decode_scan(
    cell_params, out_dense, init_states, start,
    T: int, activation: str = "tanh", out_activation: str = "softmax",
    interpret: bool = False,
):
    """Whole-head readout decode in one Pallas kernel.

    Returns (probs, logits), each (T, B, D) -- time-major, like the raw scan
    in models/rnn.py before the swapaxes.
    """
    act = _activation(activation)
    out_act_fn = _out_act_fn(out_activation)
    # the kernels implement 1/2-layer heads -- a structural constraint that
    # holds in interpret mode too (a 3-layer head would silently decode as
    # 1-layer); only the backend/VMEM checks are hardware-only
    if len(cell_params) not in (1, 2) or (
        not interpret
        and (
            jax.default_backend() != "tpu"
            or not decoder_scan_supported(cell_params, start, init_states)
        )
    ):
        return _decode_scan_reference(
            cell_params, out_dense, init_states, start, T, act, out_act_fn
        )
    return _decode_scan_pallas(
        cell_params, out_dense, init_states, start, T, activation,
        out_activation, interpret,
    )


def _out_act_fn(name: str):
    if name == "softmax":
        return lambda x: jax.nn.softmax(x, axis=-1)
    if name == "sigmoid":
        return jax.nn.sigmoid
    return lambda x: x


def _fds_fwd(cell_params, out_dense, init_states, start, T, activation,
             out_activation, interpret):
    out = fused_decode_scan(
        cell_params, out_dense, init_states, start, T, activation,
        out_activation, interpret,
    )
    return out, (cell_params, out_dense, init_states, start)


def _fds_bwd(T, activation, out_activation, interpret, residuals, g):
    cell_params, out_dense, init_states, start = residuals
    act = _activation(activation)
    out_act_fn = _out_act_fn(out_activation)
    _, vjp = jax.vjp(
        lambda cp, od, si, st: _decode_scan_reference(cp, od, si, st, T, act, out_act_fn),
        cell_params, out_dense, init_states, start,
    )
    return vjp(g)


fused_decode_scan.defvjp(_fds_fwd, _fds_bwd)


# ---------------------------------------------------------------------------
# Whole-scan ENCODER kernel: one pallas_call per RNN layer over the full
# sequence. xp (the precomputed x-projections, models/rnn.py _scan_layer) is
# streamed block-per-step by the grid; U stays in VMEM; h carries in scratch.
# ---------------------------------------------------------------------------

def _encoder_kernel(xp_ref, h0_ref, u_ref, out_ref, h_s, *, act,
                    return_sequences, taxis=0):
    # taxis: grid axis that walks time -- 0 untiled, 1 for the wide
    # batch-tiled variant (grid (nB, T); the carry re-inits per tile)
    import jax.experimental.pallas as pl

    step = pl.program_id(taxis)

    @pl.when(step == 0)
    def _init():
        h_s[:] = h0_ref[:]

    h = h_s[:]
    xp = xp_ref[0]
    H = h.shape[-1]
    hu_zr = jnp.dot(h, u_ref[:, : 2 * H], preferred_element_type=jnp.float32)
    z = jax.nn.sigmoid(xp[:, :H] + hu_zr[:, :H])
    r = jax.nn.sigmoid(xp[:, H : 2 * H] + hu_zr[:, H:])
    hh = act(
        xp[:, 2 * H :]
        + jnp.dot(r * h, u_ref[:, 2 * H :], preferred_element_type=jnp.float32)
    )
    new_h = z * h + (1.0 - z) * hh
    h_s[:] = new_h.astype(h_s.dtype)
    if return_sequences:
        out_ref[0] = new_h.astype(out_ref.dtype)
    else:
        @pl.when(step == pl.num_programs(taxis) - 1)
        def _final():
            out_ref[:] = new_h.astype(out_ref.dtype)


def _encoder_vmem_ok(
    B: int, H: int, itemsize: int = 4, limit: int = 15_500_000
) -> bool:
    # The gate-temporaries headroom overcounts (Mosaic reuses registers),
    # so the ceiling is calibrated rather than _VMEM_LIMIT_BYTES: the
    # kernel is VERIFIED to compile and match the jnp reference at
    # (B=256, H=512) f32 on the v5e (16 MB/core), where this formula gives
    # 12.5 MB.
    operand = H * 3 * H + 3 * B * H + B * 3 * H
    f32 = 4 * B * 3 * H  # gate temporaries
    return operand * itemsize + f32 * 4 < limit


def _encoder_scan_reference(xp, h0, u, act, return_sequences):
    def step(h, xp_t):
        H = h.shape[-1]
        hu_zr = h @ u[:, : 2 * H]
        z = jax.nn.sigmoid(xp_t[:, :H] + hu_zr[:, :H])
        r = jax.nn.sigmoid(xp_t[:, H : 2 * H] + hu_zr[:, H:])
        hh = act(xp_t[:, 2 * H :] + (r * h) @ u[:, 2 * H :])
        new_h = (z * h + (1.0 - z) * hh).astype(h.dtype)
        return new_h, (new_h if return_sequences else None)

    final, seq = jax.lax.scan(step, h0, xp)
    return seq if return_sequences else final


def _encoder_scan_pallas(xp, h0, u, activation, return_sequences, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    T, B, _ = xp.shape
    H = h0.shape[-1]
    kernel = functools.partial(
        _encoder_kernel, act=act, return_sequences=return_sequences
    )
    out_shape = (
        jax.ShapeDtypeStruct((T, B, H), xp.dtype)
        if return_sequences
        else jax.ShapeDtypeStruct((B, H), xp.dtype)
    )
    out_spec = (
        pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        if return_sequences
        else pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kernel,
        grid=(T,),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec((1, B, 3 * H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((B, H), xp.dtype)],
        interpret=interpret,
    )(xp, h0, u)


def _encoder_wide_bytes(bt: int, H: int, s: int,
                        return_sequences: bool) -> int:
    """Exact-operand VMEM model for the wide inference encoder kernel: with
    return_sequences the kernel shape equals fused_train's wide forward
    (same calibration applies); without, the output is a single pinned
    (bt, H) block rather than a double-buffered stream (one bt*H*s less)."""
    from .fused_train import _TEMPS_FWD

    out = 2 * bt * H if return_sequences else bt * H
    return (
        H * 3 * H * s                       # U resident across tiles
        + (2 * bt * 3 * H + out) * s        # xp-in stream + output
        + 2 * bt * H * s                    # h0 block + carry scratch
        + _TEMPS_FWD[min(s, 4)] * bt * H
    )


def _encoder_wide_btile(B: int, H: int, s: int,
                        return_sequences: bool = True) -> int:
    """Batch tile for the wide (batch-tiled grid) encoder kernel at H where
    the untiled kernel's VMEM no longer fits; 0 when even the smallest tile
    cannot (U alone too big). Lazy import avoids the module cycle."""
    from .fused_train import _WIDE_BUDGET_BYTES, _btile

    # require a REAL tile (bt < B): an untiled dispatch here would
    # contradict the _encoder_vmem_ok rejection that routed us here
    return _btile(
        B,
        lambda bt: bt < B
        and _encoder_wide_bytes(bt, H, s, return_sequences)
        < _WIDE_BUDGET_BYTES,
    )


def _encoder_scan_wide_pallas(xp, h0, u, activation, return_sequences,
                              interpret, bt):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    T, B, _ = xp.shape
    H = h0.shape[-1]
    kernel = functools.partial(
        _encoder_kernel, act=act, return_sequences=return_sequences, taxis=1
    )
    out_shape = (
        jax.ShapeDtypeStruct((T, B, H), xp.dtype)
        if return_sequences
        else jax.ShapeDtypeStruct((B, H), xp.dtype)
    )
    out_spec = (
        pl.BlockSpec((1, bt, H), lambda b, s: (s, b, 0),
                     memory_space=pltpu.VMEM)
        if return_sequences
        else pl.BlockSpec((bt, H), lambda b, s: (b, 0),
                          memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kernel,
        grid=(B // bt, T),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec((1, bt, 3 * H), lambda b, s: (s, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H), lambda b, s: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((bt, H), xp.dtype)],
        interpret=interpret,
    )(xp, h0, u)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_encoder_scan(
    xp, h0, u, activation: str = "tanh", return_sequences: bool = False,
    interpret: bool = False,
):
    """GRU layer over a full sequence in one kernel.

    xp: (T, B, 3H) precomputed x-projections (time-major); h0: (B, H);
    returns (T, B, H) if return_sequences else (B, H). Widths past the
    untiled VMEM fit take a batch-tiled grid (U resident once across
    tiles); only when even that cannot fit does the jnp scan run."""
    act = _activation(activation)
    B = xp.shape[1]
    H = h0.shape[-1]
    if not interpret:
        if jax.default_backend() != "tpu":
            return _encoder_scan_reference(xp, h0, u, act, return_sequences)
        if not _encoder_vmem_ok(B, H, xp.dtype.itemsize):
            bt = _encoder_wide_btile(
                B, H, xp.dtype.itemsize, return_sequences
            )
            if bt:
                return _encoder_scan_wide_pallas(
                    xp, h0, u, activation, return_sequences, interpret, bt
                )
            return _encoder_scan_reference(xp, h0, u, act, return_sequences)
    return _encoder_scan_pallas(xp, h0, u, activation, return_sequences, interpret)


def _fes_fwd(xp, h0, u, activation, return_sequences, interpret):
    return (
        fused_encoder_scan(xp, h0, u, activation, return_sequences, interpret),
        (xp, h0, u),
    )


def _fes_bwd(activation, return_sequences, interpret, residuals, g):
    xp, h0, u = residuals
    act = _activation(activation)
    _, vjp = jax.vjp(
        lambda a, b, c: _encoder_scan_reference(a, b, c, act, return_sequences),
        xp, h0, u,
    )
    return vjp(g)


fused_encoder_scan.defvjp(_fes_fwd, _fes_bwd)

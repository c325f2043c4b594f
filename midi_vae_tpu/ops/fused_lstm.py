"""Pallas TPU kernels: fused LSTM step + whole-scan LSTM layers.

Mirror of the GRU kernel family (ops/fused_gru.py, ops/fused_decoder.py) for
the LSTM cell the reference also offers (/root/reference/vae_definition.py:
528-533 builds ``LSTMCell`` decoders when ``cell_type`` selects them; the
encoder equivalent at :455-461). The recurrent step is two matmuls (x@W on
the MXU, h@U on the MXU) plus the i/f/g/o gate math on the VPU; fusing them
into one pallas_call keeps every intermediate in VMEM. The (h, c) carry pair
lives in scratch for the whole-scan variants, so cell state never touches HBM
between timesteps.

Variants (same taxonomy as the GRU family):
  * ``lstm_step``            : full step   (x, h, c, W, U, b)   -> (h', c')
  * ``lstm_recurrent_step``  : recurrent   (xp, h, c, U)        -> (h', c')
    (x@W+b for ALL timesteps batched into one matmul before the scan)
  * ``fused_lstm_encoder_scan``: a whole RNN layer over (T, B, 4H) xp in one
    kernel -- grid = time, U resident in VMEM, (h, c) in scratch
  * ``fused_lstm_decode_scan`` : a whole autoregressive readout head (1- or
    2-layer) in one kernel, output Dense + softmax feedback included

All are differentiable via custom VJP whose backward re-runs the pure-jnp
math (rematerialization), and all fall back to that same jnp math off-TPU.

Gate math (standard LSTM, matching models/cells.py LSTMCell):
  i,f,g,o = split(xp + h@U, 4);  c' = sig(f)*c + sig(i)*act(g)
  h' = sig(o)*act(c')
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fused_gru import _VMEM_LIMIT_BYTES, _activation


def _fits_vmem(B: int, D: int, H: int, itemsize: int = 4) -> bool:
    # operand-dtype residents at the operands' itemsize (bf16 halves them);
    # f32 gate temporaries at 4 bytes -- see fused_gru._fits_vmem.
    operand = (
        B * D            # x
        + 2 * B * H      # h, c
        + D * 4 * H      # W
        + H * 4 * H      # U
        + 4 * H          # b
        + 2 * B * H      # outputs
    )
    f32 = 2 * B * 4 * H  # gate scratch headroom
    return operand * itemsize + f32 * 4 < _VMEM_LIMIT_BYTES


def _lstm_gates(xp, h, c, u, act):
    """(xp, h, c) -> (h', c'). xp already includes x@W + b."""
    H = h.shape[-1]
    gates = xp + jnp.dot(h, u, preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = act(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    new_c = f * c + i * g
    new_h = o * act(new_c)
    return new_h, new_c


def _lstm_full_kernel(x_ref, h_ref, c_ref, w_ref, u_ref, b_ref,
                      h_out_ref, c_out_ref, *, act):
    xw = (
        jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    )
    new_h, new_c = _lstm_gates(xw, h_ref[:], c_ref[:], u_ref[:], act)
    h_out_ref[:] = new_h.astype(h_out_ref.dtype)
    c_out_ref[:] = new_c.astype(c_out_ref.dtype)


def _lstm_recurrent_kernel(xp_ref, h_ref, c_ref, u_ref,
                           h_out_ref, c_out_ref, *, act):
    new_h, new_c = _lstm_gates(xp_ref[:], h_ref[:], c_ref[:], u_ref[:], act)
    h_out_ref[:] = new_h.astype(h_out_ref.dtype)
    c_out_ref[:] = new_c.astype(c_out_ref.dtype)


def _lstm_step_reference(x, h, c, w, u, b, act):
    # outputs cast to the input dtype to MATCH the pallas primal
    # (_lstm_gates computes f32 via preferred_element_type; without the cast
    # a bf16 model's custom-VJP cotangent dtypes mismatch in _lstm_step_bwd)
    new_h, new_c = _lstm_gates(x @ w + b, h, c, u, act)
    return new_h.astype(x.dtype), new_c.astype(x.dtype)


def _lstm_recurrent_reference(xp, h, c, u, act):
    new_h, new_c = _lstm_gates(xp, h, c, u, act)  # see _lstm_step_reference
    return new_h.astype(xp.dtype), new_c.astype(xp.dtype)


def _lstm_step_pallas(x, h, c, w, u, b, activation: str, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    B, D = x.shape
    H = h.shape[-1]
    if not interpret and (
        jax.default_backend() not in ("tpu",)
        or not _fits_vmem(B, D, H, x.dtype.itemsize)
    ):
        return _lstm_step_reference(x, h, c, w, u, b, act)
    kernel = functools.partial(_lstm_full_kernel, act=act)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H), x.dtype),
            jax.ShapeDtypeStruct((B, H), x.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, h, c, w, u, b)


def _lstm_recurrent_pallas(xp, h, c, u, activation: str, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    B = xp.shape[0]
    H = h.shape[-1]
    if not interpret and (
        jax.default_backend() not in ("tpu",)
        or not _fits_vmem(B, 0, H, xp.dtype.itemsize)
    ):
        return _lstm_recurrent_reference(xp, h, c, u, act)
    kernel = functools.partial(_lstm_recurrent_kernel, act=act)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H), xp.dtype),
            jax.ShapeDtypeStruct((B, H), xp.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xp, h, c, u)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def lstm_step(x, h, c, w, u, b, activation: str = "tanh",
              interpret: bool = False):
    """Fused full LSTM step on TPU; plain-jnp fallback off-TPU; differentiable.

    Returns (h', c')."""
    return _lstm_step_pallas(x, h, c, w, u, b, activation, interpret)


def _lstm_step_fwd(x, h, c, w, u, b, activation, interpret):
    out = _lstm_step_pallas(x, h, c, w, u, b, activation, interpret)
    return out, (x, h, c, w, u, b)


def _lstm_step_bwd(activation, interpret, residuals, g):
    x, h, c, w, u, b = residuals
    act = _activation(activation)
    _, vjp = jax.vjp(
        lambda *args: _lstm_step_reference(*args, act), x, h, c, w, u, b
    )
    return vjp(g)


lstm_step.defvjp(_lstm_step_fwd, _lstm_step_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_recurrent_step(xp, h, c, u, activation: str = "tanh",
                        interpret: bool = False):
    """Fused recurrent-only LSTM step (x-projection precomputed).

    Returns (h', c')."""
    return _lstm_recurrent_pallas(xp, h, c, u, activation, interpret)


def _lstm_recurrent_fwd(xp, h, c, u, activation, interpret):
    out = _lstm_recurrent_pallas(xp, h, c, u, activation, interpret)
    return out, (xp, h, c, u)


def _lstm_recurrent_bwd(activation, interpret, residuals, g):
    xp, h, c, u = residuals
    act = _activation(activation)
    _, vjp = jax.vjp(
        lambda *args: _lstm_recurrent_reference(*args, act), xp, h, c, u
    )
    return vjp(g)


lstm_recurrent_step.defvjp(_lstm_recurrent_fwd, _lstm_recurrent_bwd)


def make_fused_decoder_step(activation: str = "tanh", interpret: bool = False):
    """Adapter with the (params, x, states) -> (out, states) signature used
    by models/rnn.py decode_autoregressive(fused_step=...). LSTM states are
    (h, c) tuples; the step output is h'."""

    def step(p, x, states):
        h, c = states
        new_h, new_c = lstm_step(
            x, h, c, p["w"], p["u"], p["b"], activation=activation,
            interpret=interpret,
        )
        return new_h, (new_h, new_c)

    return step


# ---------------------------------------------------------------------------
# Whole-scan ENCODER kernel: one pallas_call per LSTM layer over the full
# sequence. xp (T, B, 4H) streams block-per-step via the grid; U stays in
# VMEM; (h, c) carry in scratch.
# ---------------------------------------------------------------------------

def _encoder_kernel(xp_ref, h0_ref, c0_ref, u_ref, out_ref, h_s, c_s,
                    *, act, return_sequences, taxis=0):
    # taxis: grid axis that walks time -- 0 untiled, 1 for the wide
    # batch-tiled variant (grid (nB, T); carries re-init per tile)
    import jax.experimental.pallas as pl

    step = pl.program_id(taxis)

    @pl.when(step == 0)
    def _init():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    new_h, new_c = _lstm_gates(xp_ref[0], h_s[:], c_s[:], u_ref[:], act)
    h_s[:] = new_h.astype(h_s.dtype)
    c_s[:] = new_c.astype(c_s.dtype)
    if return_sequences:
        out_ref[0] = new_h.astype(out_ref.dtype)
    else:
        @pl.when(step == pl.num_programs(taxis) - 1)
        def _final():
            out_ref[:] = new_h.astype(out_ref.dtype)


def _encoder_vmem_ok(B: int, H: int, itemsize: int = 4) -> bool:
    operand = H * 4 * H + 4 * B * H + B * 4 * H
    f32 = 4 * B * 4 * H  # gate temporaries
    return operand * itemsize + f32 * 4 < _VMEM_LIMIT_BYTES


def _encoder_wide_bytes(bt: int, H: int, s: int,
                        return_sequences: bool) -> int:
    """Exact-operand VMEM model for the wide inference LSTM encoder.
    Unlike fused_train's wide forward (which also streams cseq residuals
    for the backward), this kernel emits only h — a double-buffered
    (1, bt, H) stream with return_sequences, else one pinned (bt, H)
    block. Temps scaled 4/3 from the GRU calibration as in fused_train."""
    from .fused_train import _TEMPS_FWD

    out = 2 * bt * H if return_sequences else bt * H
    return (
        H * 4 * H * s                       # U resident across tiles
        + (2 * bt * 4 * H + out) * s        # xp-in stream + h output
        + 4 * bt * H * s                    # h0/c0 blocks + h/c carries
        + _TEMPS_FWD[min(s, 4)] * bt * H * 4 // 3
    )


def _encoder_wide_btile(B: int, H: int, s: int,
                        return_sequences: bool = True) -> int:
    """Batch tile for the wide LSTM encoder kernel (see the GRU twin in
    fused_decoder._encoder_wide_btile); 0 when no real tile fits."""
    from .fused_train import _WIDE_BUDGET_BYTES, _btile

    return _btile(
        B,
        lambda bt: bt < B
        and _encoder_wide_bytes(bt, H, s, return_sequences)
        < _WIDE_BUDGET_BYTES,
    )


def _encoder_scan_reference(xp, h0, c0, u, act, return_sequences):
    def step(carry, xp_t):
        h, c = carry
        new_h, new_c = _lstm_gates(xp_t, h, c, u, act)
        new_h = new_h.astype(h.dtype)
        new_c = new_c.astype(c.dtype)
        return (new_h, new_c), (new_h if return_sequences else None)

    (final_h, _), seq = jax.lax.scan(step, (h0, c0), xp)
    return seq if return_sequences else final_h


def _encoder_scan_pallas(xp, h0, c0, u, activation, return_sequences,
                         interpret):
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
            pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((B, H), xp.dtype),
            pltpu.VMEM((B, H), xp.dtype),
        ],
        interpret=interpret,
    )(xp, h0, c0, u)


def _encoder_scan_wide_pallas(xp, h0, c0, u, activation, return_sequences,
                              interpret, bt):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    T, B, _ = xp.shape
    H = h0.shape[-1]
    kernel = functools.partial(
        _encoder_kernel, act=act, return_sequences=return_sequences, taxis=1
    )
    brow = pl.BlockSpec((bt, H), lambda b, s: (b, 0), memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((T, B, H), xp.dtype)
        if return_sequences
        else jax.ShapeDtypeStruct((B, H), xp.dtype)
    )
    out_spec = (
        pl.BlockSpec((1, bt, H), lambda b, s: (s, b, 0),
                     memory_space=pltpu.VMEM)
        if return_sequences
        else brow
    )
    return pl.pallas_call(
        kernel,
        grid=(B // bt, T),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec((1, bt, 4 * H), lambda b, s: (s, b, 0),
                         memory_space=pltpu.VMEM),
            brow,
            brow,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((bt, H), xp.dtype),
            pltpu.VMEM((bt, H), xp.dtype),
        ],
        interpret=interpret,
    )(xp, h0, c0, u)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_lstm_encoder_scan(
    xp, h0, c0, u, activation: str = "tanh", return_sequences: bool = False,
    interpret: bool = False,
):
    """LSTM layer over a full sequence in one kernel.

    xp: (T, B, 4H) precomputed x-projections (time-major); h0/c0: (B, H);
    returns (T, B, H) if return_sequences else the final h (B, H). Widths
    past the untiled VMEM fit take a batch-tiled grid (U resident once
    across tiles); only when even that cannot fit does the jnp scan run."""
    act = _activation(activation)
    B = xp.shape[1]
    H = h0.shape[-1]
    if not interpret:
        if jax.default_backend() != "tpu":
            return _encoder_scan_reference(
                xp, h0, c0, u, act, return_sequences
            )
        if not _encoder_vmem_ok(B, H, xp.dtype.itemsize):
            bt = _encoder_wide_btile(
                B, H, xp.dtype.itemsize, return_sequences
            )
            if bt:
                return _encoder_scan_wide_pallas(
                    xp, h0, c0, u, activation, return_sequences, interpret, bt
                )
            return _encoder_scan_reference(
                xp, h0, c0, u, act, return_sequences
            )
    return _encoder_scan_pallas(
        xp, h0, c0, u, activation, return_sequences, interpret
    )


def _fles_fwd(xp, h0, c0, u, activation, return_sequences, interpret):
    return (
        fused_lstm_encoder_scan(
            xp, h0, c0, u, activation, return_sequences, interpret
        ),
        (xp, h0, c0, u),
    )


def _fles_bwd(activation, return_sequences, interpret, residuals, g):
    xp, h0, c0, u = residuals
    act = _activation(activation)
    _, vjp = jax.vjp(
        lambda a, b, c, d: _encoder_scan_reference(
            a, b, c, d, act, return_sequences
        ),
        xp, h0, c0, u,
    )
    return vjp(g)


fused_lstm_encoder_scan.defvjp(_fles_fwd, _fles_bwd)


# ---------------------------------------------------------------------------
# Whole-scan DECODER kernel: the full autoregressive readout head (1- or
# 2-layer LSTM + output Dense + activation feedback) in one kernel.
# ---------------------------------------------------------------------------

def _decoder_vmem_ok(
    B: int, D: int, H: int, n_layers: int, itemsize: int = 4
) -> bool:
    operand = (
        D * 4 * H + 4 * H
        + (n_layers - 1) * (H * 4 * H + 4 * H)
        + n_layers * H * 4 * H
        + H * D + D
        + 2 * n_layers * B * H   # (h, c) scratch per layer
        + B * D * 3
    )
    f32 = 4 * B * 4 * H  # gate temporaries
    return operand * itemsize + f32 * 4 < _VMEM_LIMIT_BYTES


def _cell_gates(x, h, c, w, u, b, act):
    xw = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
    return _lstm_gates(xw, h, c, u, act)


def _apply_out(logits, out_act_name):
    if out_act_name == "softmax":
        return jax.nn.softmax(logits, axis=-1)
    if out_act_name == "sigmoid":
        return jax.nn.sigmoid(logits)
    return logits


def _decode_kernel_2layer(
    x0_ref, h1_ref, c1_ref, h2_ref, c2_ref,
    w1_ref, u1_ref, b1_ref, w2_ref, u2_ref, b2_ref, wo_ref, bo_ref,
    probs_ref, logits_ref,
    h1_s, c1_s, h2_s, c2_s, x_s,
    *, act, out_act_name,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h1_s[:] = h1_ref[:]
        c1_s[:] = c1_ref[:]
        h2_s[:] = h2_ref[:]
        c2_s[:] = c2_ref[:]
        x_s[:] = x0_ref[:]

    x = x_s[:]
    h1, c1 = _cell_gates(x, h1_s[:], c1_s[:], w1_ref[:], u1_ref[:], b1_ref[:], act)
    h2, c2 = _cell_gates(h1, h2_s[:], c2_s[:], w2_ref[:], u2_ref[:], b2_ref[:], act)
    logits = jnp.dot(h2, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:]
    probs = _apply_out(logits, out_act_name)
    probs_ref[0] = probs.astype(probs_ref.dtype)
    logits_ref[0] = logits.astype(logits_ref.dtype)
    h1_s[:] = h1.astype(h1_s.dtype)
    c1_s[:] = c1.astype(c1_s.dtype)
    h2_s[:] = h2.astype(h2_s.dtype)
    c2_s[:] = c2.astype(c2_s.dtype)
    x_s[:] = probs.astype(x_s.dtype)


def _decode_kernel_1layer(
    x0_ref, h1_ref, c1_ref,
    w1_ref, u1_ref, b1_ref, wo_ref, bo_ref,
    probs_ref, logits_ref,
    h1_s, c1_s, x_s,
    *, act, out_act_name,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h1_s[:] = h1_ref[:]
        c1_s[:] = c1_ref[:]
        x_s[:] = x0_ref[:]

    x = x_s[:]
    h1, c1 = _cell_gates(x, h1_s[:], c1_s[:], w1_ref[:], u1_ref[:], b1_ref[:], act)
    logits = jnp.dot(h1, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:]
    probs = _apply_out(logits, out_act_name)
    probs_ref[0] = probs.astype(probs_ref.dtype)
    logits_ref[0] = logits.astype(logits_ref.dtype)
    h1_s[:] = h1.astype(h1_s.dtype)
    c1_s[:] = c1.astype(c1_s.dtype)
    x_s[:] = probs.astype(x_s.dtype)


def _decode_scan_reference(cell_params, out_dense, init_states, start, T,
                           act, out_act):
    """Pure-jnp equivalent scan (also the VJP backward path). init_states is
    a tuple of (h, c) pairs, one per layer."""

    def step(carry, _):
        states, prev = carry
        x = prev
        new_states = []
        for p, (h, c) in zip(cell_params, states):
            new_h, new_c = _cell_gates(x, h, c, p["w"], p["u"], p["b"], act)
            x = new_h.astype(h.dtype)
            new_states.append((x, new_c.astype(c.dtype)))
        logits = x @ out_dense["w"] + out_dense["b"]
        probs = out_act(logits).astype(prev.dtype)
        return (tuple(new_states), probs), (probs, logits)

    (_, _), (probs, logits) = jax.lax.scan(
        step, (tuple(init_states), start), None, length=T
    )
    return probs, logits  # (T, B, D)


def _decode_scan_pallas(cell_params, out_dense, init_states, start, T,
                        activation, out_activation, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    n_layers = len(cell_params)
    B, D = start.shape
    H = init_states[0][0].shape[-1]

    def outspec():
        return pl.BlockSpec((1, B, D), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((T, B, D), start.dtype),
        jax.ShapeDtypeStruct((T, B, D), start.dtype),
    )
    if n_layers == 2:
        kernel = functools.partial(
            _decode_kernel_2layer, act=act, out_act_name=out_activation
        )
        inputs = (
            start,
            init_states[0][0], init_states[0][1],
            init_states[1][0], init_states[1][1],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            cell_params[1]["w"], cell_params[1]["u"], cell_params[1]["b"],
            out_dense["w"], out_dense["b"],
        )
        scratch = [
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, D), start.dtype),
        ]
    else:
        kernel = functools.partial(
            _decode_kernel_1layer, act=act, out_act_name=out_activation
        )
        inputs = (
            start, init_states[0][0], init_states[0][1],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            out_dense["w"], out_dense["b"],
        )
        scratch = [
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, D), start.dtype),
        ]

    probs, logits = pl.pallas_call(
        kernel,
        grid=(T,),
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
    H = init_states[0][0].shape[-1]
    return _decoder_vmem_ok(B, D, H, n_layers, start.dtype.itemsize)


def _out_act_fn(name: str):
    if name == "softmax":
        return lambda x: jax.nn.softmax(x, axis=-1)
    if name == "sigmoid":
        return jax.nn.sigmoid
    return lambda x: x


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_lstm_decode_scan(
    cell_params, out_dense, init_states, start,
    T: int, activation: str = "tanh", out_activation: str = "softmax",
    interpret: bool = False,
):
    """Whole-head LSTM readout decode in one Pallas kernel.

    init_states: tuple of (h, c) pairs per layer. Returns (probs, logits),
    each (T, B, D) time-major."""
    act = _activation(activation)
    out_act_fn = _out_act_fn(out_activation)
    # 1/2-layer heads only: structural, holds in interpret mode too
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


def _flds_fwd(cell_params, out_dense, init_states, start, T, activation,
              out_activation, interpret):
    out = fused_lstm_decode_scan(
        cell_params, out_dense, init_states, start, T, activation,
        out_activation, interpret,
    )
    return out, (cell_params, out_dense, init_states, start)


def _flds_bwd(T, activation, out_activation, interpret, residuals, g):
    cell_params, out_dense, init_states, start = residuals
    act = _activation(activation)
    out_act_fn = _out_act_fn(out_activation)
    _, vjp = jax.vjp(
        lambda cp, od, si, st: _decode_scan_reference(
            cp, od, si, st, T, act, out_act_fn
        ),
        cell_params, out_dense, init_states, start,
    )
    return vjp(g)


fused_lstm_decode_scan.defvjp(_flds_fwd, _flds_bwd)

"""Pallas TPU kernels: whole-scan GRU layers with a FUSED TRAINING BACKWARD.

The round-1 kernels (ops/fused_decoder.py) fuse the forward scan but their
custom VJP re-runs the pure-jnp scan and transposes through it -- measured
slower end-to-end than per-step kernels in f32 training. This module closes
that gap: the backward is itself one Pallas kernel running the scan transpose
(reverse-time BPTT) with the recurrent weights and the running dU accumulator
resident in VMEM, so a training layer is exactly TWO kernel launches (one
forward, one backward) instead of T per-step dispatches each way.

Residual strategy: the forward emits the full hidden-state sequence h_seq
(T, B, H) -- 4 MB at reference scale, cheap in HBM -- and the backward
recomputes the gate values from (xp[t], h[t-1]) on the fly (compute is MXU
cheap; storing z/r/hh would triple the residual traffic).

Backward math per reverse step t (classic reset-before GRU, as in
models/cells.py; act = tanh):

  recompute:  z = sig(xz + h.Uz)   r = sig(xr + h.Ur)
              a = xh + (r*h).Uh    hh = tanh(a)        [h = h_{t-1}]
  incoming:   dh = carry (+ dseq[t] if return_sequences)
  dz   = dh * (h - hh)            da_z = dz * z * (1-z)
  dhh  = dh * (1-z)               da   = dhh * (1-hh^2)
  drh  = da . Uh^T                dr   = drh * h
  da_r = dr * r * (1-r)
  dxp[t] = [da_z, da_r, da]
  dU   += [h^T.da_z, h^T.da_r, (r*h)^T.da]
  carry = dh*z + drh*r + da_z.Uz^T + da_r.Ur^T

Only ``tanh`` has a fused backward (the reference's shipped activation,
settings.py:119); other activations fall back to jnp autodiff of the scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fused_decoder import _encoder_scan_reference, _encoder_vmem_ok
from .fused_gru import _activation


def _dot(a, b):  # (B, X) @ (X, Y)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t(a, b):  # (B, X) @ (Y, X)^T -> (B, Y)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _outer_acc(a, b):  # (B, X)^T @ (B, Y) -> (X, Y)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# Forward kernel: identical math to fused_decoder._encoder_kernel but always
# emits the full h sequence (the training residual).
# ---------------------------------------------------------------------------

def _fwd_kernel(xp_ref, h0_ref, u_ref, seq_ref, h_s, *, act, taxis=0):
    # taxis: which grid axis walks time. 0 for the untiled kernel; 1 for the
    # wide-model batch-tiled variant (grid (nB, T): per batch tile, a full
    # time sweep; the scratch carry re-initializes at each tile's step 0).
    import jax.experimental.pallas as pl

    step = pl.program_id(taxis)

    @pl.when(step == 0)
    def _init():
        h_s[:] = h0_ref[:]

    h = h_s[:]
    xp = xp_ref[0]
    H = h.shape[-1]
    hu_zr = _dot(h, u_ref[:, : 2 * H])
    z = jax.nn.sigmoid(xp[:, :H] + hu_zr[:, :H])
    r = jax.nn.sigmoid(xp[:, H : 2 * H] + hu_zr[:, H:])
    hh = act(xp[:, 2 * H :] + _dot(r * h, u_ref[:, 2 * H :]))
    new_h = z * h + (1.0 - z) * hh
    h_s[:] = new_h.astype(h_s.dtype)
    seq_ref[0] = new_h.astype(seq_ref.dtype)


def _fwd_pallas(xp, h0, u, activation, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    T, B, _ = xp.shape
    H = h0.shape[-1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, act=act),
        grid=(T,),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xp.dtype),
        in_specs=[
            pl.BlockSpec((1, B, 3 * H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, H), xp.dtype)],
        interpret=interpret,
    )(xp, h0, u)


# ---------------------------------------------------------------------------
# Backward kernel: reverse-time scan transpose.
# ---------------------------------------------------------------------------

def _bwd_kernel(
    xp_ref, hseq_ref, h0_ref, dseq_ref, dfinal_ref, u_ref,
    dxp_ref, dh0_ref, du_ref,
    dh_s,
    *, return_sequences,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)           # 0 .. T-1, walking t = T-1 .. 0
    H = dh_s.shape[-1]
    last = pl.num_programs(0) - 1

    @pl.when(step == 0)
    def _init():
        du_ref[:] = jnp.zeros_like(du_ref)
        if return_sequences:
            dh_s[:] = jnp.zeros_like(dh_s)
        else:
            dh_s[:] = dfinal_ref[:].astype(dh_s.dtype)

    xp = xp_ref[0]
    # h_{t-1} straight from the forward h sequence (shifted index map);
    # h0 substituted at the final grid step (t=0) -- see _bwdx_kernel
    h = jnp.where(step == last, h0_ref[:], hseq_ref[0])
    u = u_ref[:]

    # recompute gates (f32 math)
    hu_zr = _dot(h, u[:, : 2 * H])
    z = jax.nn.sigmoid(xp[:, :H].astype(jnp.float32) + hu_zr[:, :H])
    r = jax.nn.sigmoid(xp[:, H : 2 * H].astype(jnp.float32) + hu_zr[:, H:])
    rh = r * h.astype(jnp.float32)
    hh = jnp.tanh(xp[:, 2 * H :].astype(jnp.float32) + _dot(rh, u[:, 2 * H :]))

    dh = dh_s[:].astype(jnp.float32)
    if return_sequences:
        dh = dh + dseq_ref[0].astype(jnp.float32)

    dz = dh * (h.astype(jnp.float32) - hh)
    da = dh * (1.0 - z) * (1.0 - hh * hh)
    drh = _dot_t(da, u[:, 2 * H :])
    dr = drh * h.astype(jnp.float32)
    da_z = dz * z * (1.0 - z)
    da_r = dr * r * (1.0 - r)
    da_zr = jnp.concatenate([da_z, da_r], axis=-1)

    dxp_ref[0] = jnp.concatenate([da_zr, da], axis=-1).astype(dxp_ref.dtype)
    du_ref[:, : 2 * H] += _outer_acc(h, da_zr)
    du_ref[:, 2 * H :] += _outer_acc(rh, da)

    new_dh = dh * z + drh * r + _dot_t(da_zr, u[:, : 2 * H])
    dh_s[:] = new_dh.astype(dh_s.dtype)

    @pl.when(step == last)
    def _final():
        dh0_ref[:] = new_dh.astype(dh0_ref.dtype)


def _bwd_pallas(xp, seq, h0, d_seq, d_final, u, return_sequences, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, _ = xp.shape
    H = u.shape[0]
    rev = lambda t: (T - 1 - t, 0, 0)  # noqa: E731

    out_shape = (
        jax.ShapeDtypeStruct((T, B, 3 * H), xp.dtype),   # dxp
        jax.ShapeDtypeStruct((B, H), xp.dtype),          # dh0
        jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),   # du (f32 accum)
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, return_sequences=return_sequences),
        grid=(T,),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec((1, B, 3 * H), rev, memory_space=pltpu.VMEM),  # xp
            _hprev_spec(T, B, H),                                       # h seq
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # h0
            # the unread cotangent (static return_sequences guards it) is a
            # dummy pinned to block 0 -- no per-step HBM traffic for it
            pl.BlockSpec(
                (1, B, H),
                rev if return_sequences else (lambda t: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),                       # dfinal
            pl.BlockSpec(memory_space=pltpu.VMEM),                       # u
        ],
        out_specs=(
            pl.BlockSpec((1, B, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),        # dh carry
        ],
        interpret=interpret,
    )(xp, seq, h0, d_seq, d_final, u)


def _train_vmem_ok(B: int, H: int, itemsize: int = 4) -> bool:
    # bwd holds: u (H,3H) and per-step blocks xp/dxp (B,3H)x2 and
    # hprev/dseq (B,H)x2 in the operand dtype (dxp is emitted in xp.dtype);
    # du scratch (H,3H), dh carry (B,H) and gate temps ~8*(B,H) in f32.
    # Ceiling calibrated on chip at the EDGE CASES, not _VMEM_LIMIT_BYTES:
    # (B=256, H=512) bf16 (formula: 11.6 MB) compiles and runs in every
    # compile context tried, including the chipless-AOT path
    # (tools/profile_step.py). (B=256, H=512) f32 (formula: 15.3 MB)
    # compiles under the runtime JIT but its bwd hits a 17.6 MB scoped-vmem
    # allocation (> the 16 MB core) under the AOT compiler -- its fit is
    # scheduling-context-dependent, so it is REJECTED: the 13 MB ceiling
    # splits the two.
    operand = H * 3 * H + 2 * B * 3 * H + 2 * B * H
    f32 = H * 3 * H + B * H + 8 * B * H
    return (
        operand * itemsize + f32 * 4 < 13_000_000
        and _encoder_vmem_ok(B, H, itemsize)
    )


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gru_layer_train(
    xp, h0, u, activation: str = "tanh", return_sequences: bool = False,
    interpret: bool = False,
):
    """GRU layer over a full sequence: fused fwd AND fused bwd.

    xp: (T, B, 3H) precomputed x-projections (time-major); h0: (B, H);
    returns (T, B, H) if return_sequences else the final h (B, H). Use this
    on training paths; inference paths can use fused_encoder_scan (no
    residual output).

    Three dispatch tiers (see the wide-model section below): 'inplace'
    (weight grads resident in the bwd kernel), 'wide' (two-pass: batch-tiled
    da_cat kernel + XLA weight-grad matmuls, for H where dU residency no
    longer fits VMEM), 'scan' (jnp fallback)."""
    act = _activation(activation)
    mode = _gru_mode(xp, h0, activation, interpret)
    if mode == "scan":
        return _encoder_scan_reference(xp, h0, u, act, return_sequences)
    if mode == "wide":
        bt = _gru_wide_btiles(xp.shape[1], h0.shape[-1], xp.dtype.itemsize)[0]
        seq = _fwd_wide_pallas(xp, h0, u, activation, interpret, bt or xp.shape[1])
    else:
        seq = _fwd_pallas(xp, h0, u, activation, interpret)
    return seq if return_sequences else seq[-1]


def _glt_fwd(xp, h0, u, activation, return_sequences, interpret):
    act = _activation(activation)
    mode = _gru_mode(xp, h0, activation, interpret)
    if mode == "scan":
        out, vjp = jax.vjp(
            lambda a, b, c: _encoder_scan_reference(
                a, b, c, act, return_sequences
            ),
            xp, h0, u,
        )
        return out, (vjp,)
    if mode == "wide":
        bt = _gru_wide_btiles(xp.shape[1], h0.shape[-1], xp.dtype.itemsize)[0]
        seq = _fwd_wide_pallas(xp, h0, u, activation, interpret, bt or xp.shape[1])
    else:
        seq = _fwd_pallas(xp, h0, u, activation, interpret)
    out = seq if return_sequences else seq[-1]
    return out, (xp, h0, u, seq)


def _glt_bwd(activation, return_sequences, interpret, residuals, g):
    if len(residuals) == 1:  # jnp fallback path
        (vjp,) = residuals
        return vjp(g)
    xp, h0, u, seq = residuals
    if return_sequences:
        d_seq = g
        d_final = jnp.zeros_like(h0)
    else:
        d_seq = jnp.zeros_like(seq[:1])  # dummy block, never read
        d_final = g
    if _gru_mode(xp, h0, activation, interpret) == "wide":
        bt = _gru_wide_btiles(xp.shape[1], u.shape[0], xp.dtype.itemsize)[1]
        dacat, dh0 = _bwd_wide_pallas(
            xp, seq, h0, d_seq, d_final, u, return_sequences, interpret,
            bt or xp.shape[1],
        )
        du = _gru_wide_weight_grads(xp, seq, h0, u, dacat)
        return dacat, dh0, du.astype(u.dtype)
    dxp, dh0, du = _bwd_pallas(
        xp, seq, h0, d_seq, d_final, u, return_sequences, interpret
    )
    return dxp, dh0, du.astype(u.dtype)


gru_layer_train.defvjp(_glt_fwd, _glt_bwd)


# ===========================================================================
# Whole-head DECODER with fused training backward.
#
# The autoregressive readout decode (output fed back as next input,
# vae_definition.py:519-570 semantics) in one forward kernel that also emits
# the per-layer hidden sequences as residuals, plus one reverse-time backward
# kernel that recomputes the gates and transposes through the cells, the
# output Dense, AND the activation feedback path. Supports 1- and 2-layer
# GRU heads with softmax / sigmoid / linear outputs -- the reference's
# decoder zoo (notes/next = 2 layers softmax, velocity = 1 layer sigmoid,
# instrument/held = 1 layer softmax).
# ===========================================================================

from .fused_decoder import _decode_scan_reference, _out_act_fn  # noqa: E402


def _gru_cell_bwd_core(x, hp, w, u, b, dh):
    """Backward through one GRU step given (x, h_prev) and the output grad.

    Returns (dx, dh_prev, da_cat, rh) -- all f32; da_cat is the
    pre-activation gate grad [da_z, da_r, da] the weight grads reduce
    over, rh = r*h_prev (the candidate-gate dU operand)."""
    H = hp.shape[-1]
    x = x.astype(jnp.float32)
    hp = hp.astype(jnp.float32)
    xp = _dot(x, w) + b.astype(jnp.float32)
    hu = _dot(hp, u[:, : 2 * H])
    z = jax.nn.sigmoid(xp[:, :H] + hu[:, :H])
    r = jax.nn.sigmoid(xp[:, H : 2 * H] + hu[:, H:])
    rh = r * hp
    hh = jnp.tanh(xp[:, 2 * H :] + _dot(rh, u[:, 2 * H :]))

    dz = dh * (hp - hh)
    da = dh * (1.0 - z) * (1.0 - hh * hh)
    drh = _dot_t(da, u[:, 2 * H :])
    dr = drh * hp
    da_z = dz * z * (1.0 - z)
    da_r = dr * r * (1.0 - r)
    da_zr = jnp.concatenate([da_z, da_r], axis=-1)
    da_cat = jnp.concatenate([da_zr, da], axis=-1)

    dx = _dot_t(da_cat, w)
    dhp = dh * z + drh * r + _dot_t(da_zr, u[:, : 2 * H])
    return dx, dhp, da_cat, rh


def _gru_cell_bwd(x, hp, w, u, b, dh):
    """As _gru_cell_bwd_core but also reducing the in-step weight grads.

    Returns (dx, dh_prev, dW, dU, db) -- all f32."""
    H = hp.shape[-1]
    dx, dhp, da_cat, rh = _gru_cell_bwd_core(x, hp, w, u, b, dh)
    da_zr, da = da_cat[:, : 2 * H], da_cat[:, 2 * H :]
    dW = _outer_acc(x.astype(jnp.float32), da_cat)
    dU = jnp.concatenate(
        [_outer_acc(hp.astype(jnp.float32), da_zr), _outer_acc(rh, da)],
        axis=-1,
    )
    db = jnp.sum(da_cat, axis=0, keepdims=True)
    return dx, dhp, dW, dU, db


def _dlogits_from(probs, gp_total, gl, out_act_name):
    if out_act_name == "softmax":
        inner = gp_total - jnp.sum(gp_total * probs, axis=-1, keepdims=True)
        return probs * inner + gl
    if out_act_name == "sigmoid":
        return gp_total * probs * (1.0 - probs) + gl
    return gp_total + gl  # linear


# ---- forward kernels (training variant: also emit hidden sequences) ----

def _dec_fwd2_kernel(
    x0_ref, h1_ref, h2_ref,
    w1_ref, u1_ref, b1_ref, w2_ref, u2_ref, b2_ref, wo_ref, bo_ref,
    probs_ref, logits_ref, h1seq_ref, h2seq_ref,
    h1_s, h2_s, x_s,
    *, act, out_act_name, taxis=0,
):
    import jax.experimental.pallas as pl

    from .fused_decoder import _gru_gates

    step = pl.program_id(taxis)

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
    h1seq_ref[0] = h1.astype(h1seq_ref.dtype)
    h2seq_ref[0] = h2.astype(h2seq_ref.dtype)
    h1_s[:] = h1.astype(h1_s.dtype)
    h2_s[:] = h2.astype(h2_s.dtype)
    x_s[:] = probs.astype(x_s.dtype)


def _dec_fwd1_kernel(
    x0_ref, h1_ref,
    w1_ref, u1_ref, b1_ref, wo_ref, bo_ref,
    probs_ref, logits_ref, h1seq_ref,
    h1_s, x_s,
    *, act, out_act_name, taxis=0,
):
    import jax.experimental.pallas as pl

    from .fused_decoder import _gru_gates

    step = pl.program_id(taxis)

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
    h1seq_ref[0] = h1.astype(h1seq_ref.dtype)
    h1_s[:] = h1.astype(h1_s.dtype)
    x_s[:] = probs.astype(x_s.dtype)


def _dec_fwd_pallas(cell_params, out_dense, init_states, start, T,
                    activation, out_activation, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    n_layers = len(cell_params)
    B, D = start.shape
    H = init_states[0].shape[-1]
    seq = lambda d: pl.BlockSpec((1, B, d), lambda t: (t, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    if n_layers == 2:
        kernel = functools.partial(
            _dec_fwd2_kernel, act=act, out_act_name=out_activation
        )
        inputs = (
            start, init_states[0], init_states[1],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            cell_params[1]["w"], cell_params[1]["u"], cell_params[1]["b"],
            out_dense["w"], out_dense["b"],
        )
        out_shape = (
            jax.ShapeDtypeStruct((T, B, D), start.dtype),
            jax.ShapeDtypeStruct((T, B, D), start.dtype),
            jax.ShapeDtypeStruct((T, B, H), start.dtype),
            jax.ShapeDtypeStruct((T, B, H), start.dtype),
        )
        out_specs = (seq(D), seq(D), seq(H), seq(H))
        scratch = [
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, D), start.dtype),
        ]
    else:
        kernel = functools.partial(
            _dec_fwd1_kernel, act=act, out_act_name=out_activation
        )
        inputs = (
            start, init_states[0],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            out_dense["w"], out_dense["b"],
        )
        out_shape = (
            jax.ShapeDtypeStruct((T, B, D), start.dtype),
            jax.ShapeDtypeStruct((T, B, D), start.dtype),
            jax.ShapeDtypeStruct((T, B, H), start.dtype),
        )
        out_specs = (seq(D), seq(D), seq(H))
        scratch = [
            pltpu.VMEM((B, H), start.dtype),
            pltpu.VMEM((B, D), start.dtype),
        ]

    return pl.pallas_call(
        kernel,
        grid=(T,),
        out_shape=out_shape,
        in_specs=[vm] * len(inputs),
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)


# ---- backward kernels ----

def _dec_bwd2_kernel(
    xprev_ref, h1_ref, h1p_ref, h2_ref, h2p_ref, probs_ref, gp_ref, gl_ref,
    start_ref, i1_ref, i2_ref,
    w1_ref, u1_ref, b1_ref, w2_ref, u2_ref, b2_ref, wo_ref,
    dw1_ref, du1_ref, db1_ref, dw2_ref, du2_ref, db2_ref,
    dwo_ref, dbo_ref, di1_ref, di2_ref, dstart_ref,
    dh1_s, dh2_s, dx_s,
    *, out_act_name,
):
    """Reverse-time decode transpose. Step-(t-1) feedback/hiddens come from
    the forward sequences via SHIFTED index maps with start/init states
    substituted at the last grid step (t=0); the weight/bias grads
    accumulate directly in their pinned f32 output refs (no scratch
    duplicates) -- see _bwdx_kernel."""
    import jax.experimental.pallas as pl

    step = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(step == 0)
    def _init():
        dh1_s[:] = jnp.zeros_like(dh1_s)
        dh2_s[:] = jnp.zeros_like(dh2_s)
        dx_s[:] = jnp.zeros_like(dx_s)
        for ref in (dw1_ref, du1_ref, db1_ref, dw2_ref, du2_ref, db2_ref,
                    dwo_ref, dbo_ref):
            ref[:] = jnp.zeros_like(ref)

    probs = probs_ref[0].astype(jnp.float32)
    gp_total = gp_ref[0].astype(jnp.float32) + dx_s[:]
    dlog = _dlogits_from(probs, gp_total, gl_ref[0].astype(jnp.float32),
                         out_act_name)

    h2 = h2_ref[0]
    dwo_ref[:] += _outer_acc(h2.astype(jnp.float32), dlog)
    dbo_ref[:] += jnp.sum(dlog, axis=0, keepdims=True)
    dh2 = _dot_t(dlog, wo_ref[:]) + dh2_s[:]

    is_first_t = step == last
    h1 = h1_ref[0]
    h2p = jnp.where(is_first_t, i2_ref[:], h2p_ref[0])
    dx2, dh2p, dW2, dU2, db2 = _gru_cell_bwd(
        h1, h2p, w2_ref[:], u2_ref[:], b2_ref[:], dh2
    )
    dw2_ref[:] += dW2
    du2_ref[:] += dU2
    db2_ref[:] += db2

    dh1 = dx2 + dh1_s[:]
    x = jnp.where(is_first_t, start_ref[:], xprev_ref[0])
    h1p = jnp.where(is_first_t, i1_ref[:], h1p_ref[0])
    dx1, dh1p, dW1, dU1, db1 = _gru_cell_bwd(
        x, h1p, w1_ref[:], u1_ref[:], b1_ref[:], dh1
    )
    dw1_ref[:] += dW1
    du1_ref[:] += dU1
    db1_ref[:] += db1

    dh1_s[:] = dh1p
    dh2_s[:] = dh2p
    dx_s[:] = dx1

    @pl.when(step == last)
    def _final():
        di1_ref[:] = dh1p.astype(di1_ref.dtype)
        di2_ref[:] = dh2p.astype(di2_ref.dtype)
        dstart_ref[:] = dx1.astype(dstart_ref.dtype)


def _dec_bwd1_kernel(
    xprev_ref, h1_ref, h1p_ref, probs_ref, gp_ref, gl_ref,
    start_ref, i1_ref,
    w1_ref, u1_ref, b1_ref, wo_ref,
    dw1_ref, du1_ref, db1_ref, dwo_ref, dbo_ref, di1_ref, dstart_ref,
    dh1_s, dx_s,
    *, out_act_name,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(step == 0)
    def _init():
        dh1_s[:] = jnp.zeros_like(dh1_s)
        dx_s[:] = jnp.zeros_like(dx_s)
        for ref in (dw1_ref, du1_ref, db1_ref, dwo_ref, dbo_ref):
            ref[:] = jnp.zeros_like(ref)

    probs = probs_ref[0].astype(jnp.float32)
    gp_total = gp_ref[0].astype(jnp.float32) + dx_s[:]
    dlog = _dlogits_from(probs, gp_total, gl_ref[0].astype(jnp.float32),
                         out_act_name)

    h1 = h1_ref[0]
    dwo_ref[:] += _outer_acc(h1.astype(jnp.float32), dlog)
    dbo_ref[:] += jnp.sum(dlog, axis=0, keepdims=True)
    dh1 = _dot_t(dlog, wo_ref[:]) + dh1_s[:]

    is_first_t = step == last
    x = jnp.where(is_first_t, start_ref[:], xprev_ref[0])
    h1p = jnp.where(is_first_t, i1_ref[:], h1p_ref[0])
    dx1, dh1p, dW1, dU1, db1 = _gru_cell_bwd(
        x, h1p, w1_ref[:], u1_ref[:], b1_ref[:], dh1
    )
    dw1_ref[:] += dW1
    du1_ref[:] += dU1
    db1_ref[:] += db1
    dh1_s[:] = dh1p
    dx_s[:] = dx1

    @pl.when(step == last)
    def _final():
        di1_ref[:] = dh1p.astype(di1_ref.dtype)
        dstart_ref[:] = dx1.astype(dstart_ref.dtype)


def _dec_bwd_pallas(cell_params, out_dense, init_states, start,
                    probs, h_seqs, g_probs, g_logits,
                    out_activation, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(cell_params)
    T, B, D = probs.shape
    H = init_states[0].shape[-1]
    f32 = jnp.float32
    rev = lambda t: (T - 1 - t, 0, 0)  # noqa: E731
    seq = lambda d: pl.BlockSpec((1, B, d), rev, memory_space=pltpu.VMEM)  # noqa: E731
    prev = lambda d: pl.BlockSpec(  # noqa: E731  -- t-1 via shifted map
        (1, B, d), lambda s: (jnp.maximum(T - 2 - s, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    mat = lambda s: pl.BlockSpec(s, lambda t: tuple(0 for _ in s),  # noqa: E731
                                 memory_space=pltpu.VMEM)

    # weight/bias grads leave the kernel in f32 regardless of the compute
    # dtype: Mosaic cannot mask bf16 stores along subelements (odd row
    # counts like dw1's D=61, and the 1-row bias grads), and accumulation
    # is f32 anyway (directly in the pinned output refs). The VJP wrapper
    # casts them back to the primal dtype outside the kernel.
    if n_layers == 2:
        kernel = functools.partial(_dec_bwd2_kernel, out_act_name=out_activation)
        inputs = (
            probs, h_seqs[0], h_seqs[0], h_seqs[1], h_seqs[1],
            probs, g_probs, g_logits,
            start, init_states[0], init_states[1],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            cell_params[1]["w"], cell_params[1]["u"], cell_params[1]["b"],
            out_dense["w"],
        )
        in_specs = [prev(D), seq(H), prev(H), seq(H), prev(H),
                    seq(D), seq(D), seq(D)] + [vm] * 10
        out_shape = (
            jax.ShapeDtypeStruct((D, 3 * H), f32),       # dw1
            jax.ShapeDtypeStruct((H, 3 * H), f32),       # du1
            jax.ShapeDtypeStruct((1, 3 * H), f32),       # db1
            jax.ShapeDtypeStruct((H, 3 * H), f32),       # dw2
            jax.ShapeDtypeStruct((H, 3 * H), f32),       # du2
            jax.ShapeDtypeStruct((1, 3 * H), f32),       # db2
            jax.ShapeDtypeStruct((H, D), f32),           # dwo
            jax.ShapeDtypeStruct((1, D), f32),           # dbo
            jax.ShapeDtypeStruct((B, H), start.dtype),   # di1
            jax.ShapeDtypeStruct((B, H), start.dtype),   # di2
            jax.ShapeDtypeStruct((B, D), start.dtype),   # dstart
        )
        out_specs = (
            mat((D, 3 * H)), mat((H, 3 * H)), mat((1, 3 * H)),
            mat((H, 3 * H)), mat((H, 3 * H)), mat((1, 3 * H)),
            mat((H, D)), mat((1, D)),
            mat((B, H)), mat((B, H)), mat((B, D)),
        )
        scratch = [
            pltpu.VMEM((B, H), f32), pltpu.VMEM((B, H), f32),
            pltpu.VMEM((B, D), f32),
        ]
    else:
        kernel = functools.partial(_dec_bwd1_kernel, out_act_name=out_activation)
        inputs = (
            probs, h_seqs[0], h_seqs[0], probs, g_probs, g_logits,
            start, init_states[0],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            out_dense["w"],
        )
        in_specs = [prev(D), seq(H), prev(H), seq(D), seq(D), seq(D)] + [vm] * 6
        out_shape = (
            jax.ShapeDtypeStruct((D, 3 * H), f32),       # dw1
            jax.ShapeDtypeStruct((H, 3 * H), f32),       # du1
            jax.ShapeDtypeStruct((1, 3 * H), f32),       # db1
            jax.ShapeDtypeStruct((H, D), f32),           # dwo
            jax.ShapeDtypeStruct((1, D), f32),           # dbo
            jax.ShapeDtypeStruct((B, H), start.dtype),   # di1
            jax.ShapeDtypeStruct((B, D), start.dtype),   # dstart
        )
        out_specs = (
            mat((D, 3 * H)), mat((H, 3 * H)), mat((1, 3 * H)),
            mat((H, D)), mat((1, D)),
            mat((B, H)), mat((B, D)),
        )
        scratch = [
            pltpu.VMEM((B, H), f32), pltpu.VMEM((B, D), f32),
        ]

    return pl.pallas_call(
        kernel,
        grid=(T,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)


def _dec_train_vmem_ok(B: int, D: int, H: int, n_layers: int) -> bool:
    # the bwd kernel's VMEM residency: weights + pinned f32 grad outputs
    # (accumulated in place, no scratch duplicates) + double-buffered
    # per-step stream blocks + gate temporaries + f32 carries. Verified to
    # compile at reference scale (B=256, D=61, H=256, 2 layers) on v5e
    # (16 MB/core).
    weights = (
        D * 3 * H + (n_layers - 1) * H * 3 * H + n_layers * H * 3 * H + H * D
    )
    grads = weights + (n_layers * 3 * H + D)
    streams = 2 * (4 * B * D + 2 * n_layers * B * H)
    temps = 4 * B * 3 * H + 2 * B * H
    carries = n_layers * B * H + B * D
    total = (weights + grads + streams + temps + carries) * 4
    return total < 15_500_000


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _gru_decode_train_vjp(
    cell_params, out_dense, init_states, start,
    T: int, activation: str = "tanh", out_activation: str = "softmax",
    interpret: bool = False,
):
    act = _activation(activation)
    out_act_fn = _out_act_fn(out_activation)
    mode = _dec_mode(cell_params, start, init_states, activation,
                     out_activation, interpret)
    if mode == "scan":
        return _decode_scan_reference(
            cell_params, out_dense, init_states, start, T, act, out_act_fn
        )
    if mode == "wide":
        bt = _dec_wide_btiles(
            start.shape[0], start.shape[1], init_states[0].shape[-1],
            len(cell_params), start.dtype.itemsize,
        )[0]
        out = _dec_fwd_wide_pallas(
            cell_params, out_dense, init_states, start, T, activation,
            out_activation, interpret, bt or start.shape[0],
        )
    else:
        out = _dec_fwd_pallas(
            cell_params, out_dense, init_states, start, T, activation,
            out_activation, interpret,
        )
    return out[0], out[1]


def gru_decode_train(
    cell_params, out_dense, init_states, start,
    T: int, activation: str = "tanh", out_activation: str = "softmax",
    interpret: bool = False,
):
    """Whole-head readout decode with fused fwd AND fused bwd.

    Same contract as fused_decoder.fused_decode_scan -- init_states is a
    list of per-layer h (B, H); returns (probs, logits), each (T, B, D)
    time-major -- but meant for training paths: the backward is one Pallas
    kernel instead of a jnp re-scan.

    Narrow bf16 heads (velocity D=1, held D=2) are promoted WHOLE to f32
    and run the same fused kernels: their degenerate-K feedback projection
    cannot be lowered in bf16 (Mosaic mixed-type broadcast), and a D<8
    matmul gets no MXU benefit from bf16 anyway. astype is differentiable,
    so the weight grads flow back in the primal dtype automatically."""
    if start.shape[-1] < 8 and start.dtype != jnp.float32:
        f32 = functools.partial(
            jax.tree_util.tree_map, lambda a: a.astype(jnp.float32)
        )
        probs, logits = _gru_decode_train_vjp(
            f32(list(cell_params)), f32(out_dense), f32(list(init_states)),
            start.astype(jnp.float32), T, activation, out_activation,
            interpret,
        )
        return probs.astype(start.dtype), logits.astype(start.dtype)
    return _gru_decode_train_vjp(
        cell_params, out_dense, init_states, start, T, activation,
        out_activation, interpret,
    )


def _gdt_fwd(cell_params, out_dense, init_states, start, T, activation,
             out_activation, interpret):
    act = _activation(activation)
    out_act_fn = _out_act_fn(out_activation)
    mode = _dec_mode(cell_params, start, init_states, activation,
                     out_activation, interpret)
    if mode == "scan":
        out, vjp = jax.vjp(
            lambda cp, od, si, st: _decode_scan_reference(
                cp, od, si, st, T, act, out_act_fn
            ),
            cell_params, out_dense, init_states, start,
        )
        return out, (vjp,)
    if mode == "wide":
        bt = _dec_wide_btiles(
            start.shape[0], start.shape[1], init_states[0].shape[-1],
            len(cell_params), start.dtype.itemsize,
        )[0]
        res = _dec_fwd_wide_pallas(
            cell_params, out_dense, init_states, start, T, activation,
            out_activation, interpret, bt or start.shape[0],
        )
    else:
        res = _dec_fwd_pallas(
            cell_params, out_dense, init_states, start, T, activation,
            out_activation, interpret,
        )
    probs, logits = res[0], res[1]
    h_seqs = list(res[2:])
    return (probs, logits), (cell_params, out_dense, init_states, start,
                             probs, h_seqs)


def _gdt_bwd(T, activation, out_activation, interpret, residuals, g):
    if len(residuals) == 1:  # jnp fallback path
        (vjp,) = residuals
        return vjp(g)
    cell_params, out_dense, init_states, start, probs, h_seqs = residuals
    g_probs, g_logits = g
    if _dec_mode(cell_params, start, init_states, activation,
                 out_activation, interpret) == "wide":
        bt = _dec_wide_btiles(
            start.shape[0], start.shape[1], init_states[0].shape[-1],
            len(cell_params), start.dtype.itemsize,
        )[1]
        outs = _dec_bwd_wide_pallas(
            cell_params, out_dense, init_states, start, probs,
            h_seqs, g_probs, g_logits, out_activation, interpret,
            bt or start.shape[0],
        )
        if len(cell_params) == 2:
            dlog, dacat1, dacat2, di1, di2, dstart = outs
            dacats = [dacat1, dacat2]
            d_init = [di1, di2]
        else:
            dlog, dacat1, di1, dstart = outs
            dacats = [dacat1]
            d_init = [di1]
        d_cells, d_out = _dec_wide_weight_grads(
            cell_params, out_dense, init_states, start, probs, h_seqs,
            dlog, dacats,
        )
        d_cells = [
            {"w": c["w"], "u": c["u"], "b": c["b"][0]} for c in d_cells
        ]
        d_out = {"w": d_out["w"], "b": d_out["b"][0]}
        d_cells = type(cell_params)(
            jax.tree_util.tree_map(
                lambda gr, p: gr.astype(p.dtype), d_cells, list(cell_params)
            )
        )
        d_out = jax.tree_util.tree_map(
            lambda gr, p: gr.astype(p.dtype), d_out, out_dense
        )
        return d_cells, d_out, type(init_states)(d_init), dstart
    outs = _dec_bwd_pallas(
        cell_params, out_dense, init_states, start, probs,
        h_seqs, g_probs, g_logits, out_activation, interpret,
    )
    if len(cell_params) == 2:
        (dw1, du1, db1, dw2, du2, db2, dwo, dbo, di1, di2, dstart) = outs
        d_cells = [
            {"w": dw1, "u": du1, "b": db1[0]},
            {"w": dw2, "u": du2, "b": db2[0]},
        ]
        d_init = [di1, di2]
    else:
        (dw1, du1, db1, dwo, dbo, di1, dstart) = outs
        d_cells = [{"w": dw1, "u": du1, "b": db1[0]}]
        d_init = [di1]
    d_out = {"w": dwo, "b": dbo[0]}
    # weight/bias grads come out of the kernel in f32 (see _dec_bwd_pallas);
    # cast back to the primal dtype, and match the primal container types
    d_cells = type(cell_params)(
        jax.tree_util.tree_map(
            lambda g, p: g.astype(p.dtype), d_cells, list(cell_params)
        )
    )
    d_out = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype), d_out, out_dense
    )
    d_init = type(init_states)(d_init)
    return d_cells, d_out, d_init, dstart


_gru_decode_train_vjp.defvjp(_gdt_fwd, _gdt_bwd)


# ===========================================================================
# WIDE-MODEL two-pass decode-head backward (mirror of the wide layer
# kernels below): pass 1 is the reverse-time decode transpose emitting only
# the per-step dlogits and per-layer pre-activation gate grads (batch-tiled
# grid, weights resident once, no weight-grad residency); pass 2 reduces
# the weight grads as flat XLA matmuls. This admits the fused decode heads
# at H where _dec_train_vmem_ok rejects the in-place kernels (H >= 512).
# ===========================================================================

def _dpad(D: int) -> int:
    """Lane-padded width of a D-column block (Mosaic pads to 128 lanes)."""
    return ((D + 127) // 128) * 128


def _dec_wide_btiles(B: int, D: int, H: int, n: int, s: int) -> tuple[int, int]:
    """(fwd_btile, bwd_btile) for the wide decode kernels, or (0, 0)."""
    Dp = _dpad(D)
    weights = (D * 3 * H + (2 * n - 1) * H * 3 * H + H * Dp
               + n * 3 * H + Dp) * s

    def fwd_bytes(bt):
        streams = 2 * bt * (2 * Dp + n * H) * s
        scratch = (n * bt * H + bt * Dp) * s
        return (weights + streams + scratch
                + _TEMPS_FWD[min(s, 4)] * bt * (n * H + Dp))

    def bwd_bytes(bt):
        streams = 2 * bt * (5 * Dp + 5 * n * H) * s   # in + out, dbl-buffered
        pinned = (2 * Dp + 2 * n * H) * bt * s
        carries = (n * H + Dp) * bt * 4
        return (weights + streams + pinned + carries
                + _TEMPS_BWD[min(s, 4)] * bt * (n * H + Dp))

    fwd = _btile(B, lambda bt: fwd_bytes(bt) < _WIDE_BUDGET_BYTES)
    bwd = _btile(B, lambda bt: bwd_bytes(bt) < _WIDE_BUDGET_BYTES)
    return (fwd, bwd) if fwd and bwd else (0, 0)


def _dec_mode(cell_params, start, init_states, activation, out_activation,
              interpret) -> str:
    """'inplace' | 'wide' | 'scan' for the decode-head training paths."""
    if len(cell_params) not in (1, 2):
        return "scan"
    if activation != "tanh" or out_activation not in (
        "softmax", "sigmoid", "linear"
    ):
        return "scan"
    if _FORCE_TRAIN_MODE is not None:
        return _FORCE_TRAIN_MODE
    if interpret:
        return "inplace"
    B, D = start.shape
    if D < 8 and start.dtype != jnp.float32:
        # narrow heads (velocity D=1, held D=2) ride the kernels in f32
        # (device tracing: the whole-head pair replaces a ~0.5 ms
        # 64-iteration device loop with ~0.3 ms), but their degenerate-K
        # feedback projection (probs (B,1) @ W (1,3H)) lowers to a
        # broadcast-multiply Mosaic cannot express in bf16
        # ('vector.broadcast' verification error) -- gru_decode_train
        # promotes them to f32 before reaching here; a direct bf16 call
        # takes the scan
        return "scan"
    if jax.default_backend() != "tpu":
        return "scan"
    H = init_states[0].shape[-1]
    if _dec_train_vmem_ok(B, D, H, len(cell_params)):
        return "inplace"
    if _dec_wide_btiles(B, D, H, len(cell_params), start.dtype.itemsize)[0]:
        return "wide"
    return "scan"


def _dec_fwd_wide_pallas(cell_params, out_dense, init_states, start, T,
                         activation, out_activation, interpret, bt):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    n_layers = len(cell_params)
    B, D = start.shape
    H = init_states[0].shape[-1]
    seq = lambda d: pl.BlockSpec((1, bt, d), lambda b, s: (s, b, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    brow = lambda d: pl.BlockSpec((bt, d), lambda b, s: (b, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    if n_layers == 2:
        kernel = functools.partial(
            _dec_fwd2_kernel, act=act, out_act_name=out_activation, taxis=1
        )
        inputs = (
            start, init_states[0], init_states[1],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            cell_params[1]["w"], cell_params[1]["u"], cell_params[1]["b"],
            out_dense["w"], out_dense["b"],
        )
        in_specs = [brow(D), brow(H), brow(H)] + [vm] * 8
        out_shape = (
            jax.ShapeDtypeStruct((T, B, D), start.dtype),
            jax.ShapeDtypeStruct((T, B, D), start.dtype),
            jax.ShapeDtypeStruct((T, B, H), start.dtype),
            jax.ShapeDtypeStruct((T, B, H), start.dtype),
        )
        out_specs = (seq(D), seq(D), seq(H), seq(H))
        scratch = [
            pltpu.VMEM((bt, H), start.dtype),
            pltpu.VMEM((bt, H), start.dtype),
            pltpu.VMEM((bt, D), start.dtype),
        ]
    else:
        kernel = functools.partial(
            _dec_fwd1_kernel, act=act, out_act_name=out_activation, taxis=1
        )
        inputs = (
            start, init_states[0],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            out_dense["w"], out_dense["b"],
        )
        in_specs = [brow(D), brow(H)] + [vm] * 5
        out_shape = (
            jax.ShapeDtypeStruct((T, B, D), start.dtype),
            jax.ShapeDtypeStruct((T, B, D), start.dtype),
            jax.ShapeDtypeStruct((T, B, H), start.dtype),
        )
        out_specs = (seq(D), seq(D), seq(H))
        scratch = [
            pltpu.VMEM((bt, H), start.dtype),
            pltpu.VMEM((bt, D), start.dtype),
        ]

    return pl.pallas_call(
        kernel,
        grid=(B // bt, T),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)


def _dec_bwd2_wide_kernel(
    xprev_ref, h1_ref, h1p_ref, h2_ref, h2p_ref, probs_ref, gp_ref, gl_ref,
    start_ref, i1_ref, i2_ref,
    w1_ref, u1_ref, b1_ref, w2_ref, u2_ref, b2_ref, wo_ref,
    dlog_ref, dacat1_ref, dacat2_ref, di1_ref, di2_ref, dstart_ref,
    dh1_s, dh2_s, dx_s,
    *, out_act_name,
):
    """_dec_bwd2_kernel minus the weight-grad residency: emits dlogits and
    the per-layer gate grads for pass 2 (grid (nB, T), time on axis 1)."""
    import jax.experimental.pallas as pl

    step = pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(step == 0)
    def _init():
        dh1_s[:] = jnp.zeros_like(dh1_s)
        dh2_s[:] = jnp.zeros_like(dh2_s)
        dx_s[:] = jnp.zeros_like(dx_s)

    probs = probs_ref[0].astype(jnp.float32)
    gp_total = gp_ref[0].astype(jnp.float32) + dx_s[:]
    dlog = _dlogits_from(probs, gp_total, gl_ref[0].astype(jnp.float32),
                         out_act_name)
    dlog_ref[0] = dlog.astype(dlog_ref.dtype)
    dh2 = _dot_t(dlog, wo_ref[:]) + dh2_s[:]

    is_first_t = step == last
    h1 = h1_ref[0]
    h2p = jnp.where(is_first_t, i2_ref[:], h2p_ref[0])
    dx2, dh2p, dacat2, _ = _gru_cell_bwd_core(
        h1, h2p, w2_ref[:], u2_ref[:], b2_ref[:], dh2
    )
    dacat2_ref[0] = dacat2.astype(dacat2_ref.dtype)

    dh1 = dx2 + dh1_s[:]
    x = jnp.where(is_first_t, start_ref[:], xprev_ref[0])
    h1p = jnp.where(is_first_t, i1_ref[:], h1p_ref[0])
    dx1, dh1p, dacat1, _ = _gru_cell_bwd_core(
        x, h1p, w1_ref[:], u1_ref[:], b1_ref[:], dh1
    )
    dacat1_ref[0] = dacat1.astype(dacat1_ref.dtype)

    dh1_s[:] = dh1p
    dh2_s[:] = dh2p
    dx_s[:] = dx1

    @pl.when(step == last)
    def _final():
        di1_ref[:] = dh1p.astype(di1_ref.dtype)
        di2_ref[:] = dh2p.astype(di2_ref.dtype)
        dstart_ref[:] = dx1.astype(dstart_ref.dtype)


def _dec_bwd1_wide_kernel(
    xprev_ref, h1_ref, h1p_ref, probs_ref, gp_ref, gl_ref,
    start_ref, i1_ref,
    w1_ref, u1_ref, b1_ref, wo_ref,
    dlog_ref, dacat1_ref, di1_ref, dstart_ref,
    dh1_s, dx_s,
    *, out_act_name,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(step == 0)
    def _init():
        dh1_s[:] = jnp.zeros_like(dh1_s)
        dx_s[:] = jnp.zeros_like(dx_s)

    probs = probs_ref[0].astype(jnp.float32)
    gp_total = gp_ref[0].astype(jnp.float32) + dx_s[:]
    dlog = _dlogits_from(probs, gp_total, gl_ref[0].astype(jnp.float32),
                         out_act_name)
    dlog_ref[0] = dlog.astype(dlog_ref.dtype)
    dh1 = _dot_t(dlog, wo_ref[:]) + dh1_s[:]

    is_first_t = step == last
    x = jnp.where(is_first_t, start_ref[:], xprev_ref[0])
    h1p = jnp.where(is_first_t, i1_ref[:], h1p_ref[0])
    dx1, dh1p, dacat1, _ = _gru_cell_bwd_core(
        x, h1p, w1_ref[:], u1_ref[:], b1_ref[:], dh1
    )
    dacat1_ref[0] = dacat1.astype(dacat1_ref.dtype)
    dh1_s[:] = dh1p
    dx_s[:] = dx1

    @pl.when(step == last)
    def _final():
        di1_ref[:] = dh1p.astype(di1_ref.dtype)
        dstart_ref[:] = dx1.astype(dstart_ref.dtype)


def _dec_bwd_wide_pallas(cell_params, out_dense, init_states, start,
                         probs, h_seqs, g_probs, g_logits,
                         out_activation, interpret, bt):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(cell_params)
    T, B, D = probs.shape
    H = init_states[0].shape[-1]
    f32 = jnp.float32
    seq = lambda d: pl.BlockSpec(  # noqa: E731
        (1, bt, d), lambda b, s: (T - 1 - s, b, 0), memory_space=pltpu.VMEM
    )
    prev = lambda d: pl.BlockSpec(  # noqa: E731  -- t-1 via shifted map
        (1, bt, d), lambda b, s: (jnp.maximum(T - 2 - s, 0), b, 0),
        memory_space=pltpu.VMEM,
    )
    brow = lambda d: pl.BlockSpec(  # noqa: E731
        (bt, d), lambda b, s: (b, 0), memory_space=pltpu.VMEM
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    if n_layers == 2:
        kernel = functools.partial(
            _dec_bwd2_wide_kernel, out_act_name=out_activation
        )
        inputs = (
            probs, h_seqs[0], h_seqs[0], h_seqs[1], h_seqs[1],
            probs, g_probs, g_logits,
            start, init_states[0], init_states[1],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            cell_params[1]["w"], cell_params[1]["u"], cell_params[1]["b"],
            out_dense["w"],
        )
        in_specs = [prev(D), seq(H), prev(H), seq(H), prev(H),
                    seq(D), seq(D), seq(D),
                    brow(D), brow(H), brow(H)] + [vm] * 7
        out_shape = (
            jax.ShapeDtypeStruct((T, B, D), start.dtype),        # dlog
            jax.ShapeDtypeStruct((T, B, 3 * H), start.dtype),    # dacat1
            jax.ShapeDtypeStruct((T, B, 3 * H), start.dtype),    # dacat2
            jax.ShapeDtypeStruct((B, H), start.dtype),           # di1
            jax.ShapeDtypeStruct((B, H), start.dtype),           # di2
            jax.ShapeDtypeStruct((B, D), start.dtype),           # dstart
        )
        out_specs = (
            seq(D), seq(3 * H), seq(3 * H), brow(H), brow(H), brow(D)
        )
        scratch = [
            pltpu.VMEM((bt, H), f32), pltpu.VMEM((bt, H), f32),
            pltpu.VMEM((bt, D), f32),
        ]
    else:
        kernel = functools.partial(
            _dec_bwd1_wide_kernel, out_act_name=out_activation
        )
        inputs = (
            probs, h_seqs[0], h_seqs[0], probs, g_probs, g_logits,
            start, init_states[0],
            cell_params[0]["w"], cell_params[0]["u"], cell_params[0]["b"],
            out_dense["w"],
        )
        in_specs = [prev(D), seq(H), prev(H), seq(D), seq(D), seq(D),
                    brow(D), brow(H)] + [vm] * 4
        out_shape = (
            jax.ShapeDtypeStruct((T, B, D), start.dtype),        # dlog
            jax.ShapeDtypeStruct((T, B, 3 * H), start.dtype),    # dacat1
            jax.ShapeDtypeStruct((B, H), start.dtype),           # di1
            jax.ShapeDtypeStruct((B, D), start.dtype),           # dstart
        )
        out_specs = (seq(D), seq(3 * H), brow(H), brow(D))
        scratch = [
            pltpu.VMEM((bt, H), f32), pltpu.VMEM((bt, D), f32),
        ]

    return pl.pallas_call(
        kernel,
        grid=(B // bt, T),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)


def _dec_wide_weight_grads(cell_params, out_dense, init_states, start,
                           probs, h_seqs, dlog, dacats):
    """Pass 2: the decode head's weight grads as flat (T*B, .) MXU matmuls
    (f32), from the pass-1 dlogits / gate-grad streams. bf16 precision
    semantics as in _gru_wide_weight_grads: streams are stored rounded to
    the compute dtype, accumulation stays f32."""
    T, B, D = probs.shape
    H = init_states[0].shape[-1]
    f32 = jnp.float32
    n = len(cell_params)
    flat = lambda a: a.reshape(T * B, a.shape[-1]).astype(f32)  # noqa: E731

    dlog2 = flat(dlog)
    dwo = _outer_acc(flat(h_seqs[-1]), dlog2)
    dbo = jnp.sum(dlog2, axis=0, keepdims=True)

    # layer l's input sequence: fed-back probs for layer 0 (start at t=0),
    # layer 0's aligned output sequence for layer 1
    xs = [jnp.concatenate([start[None], probs[:-1]], axis=0)]
    if n == 2:
        xs.append(h_seqs[0])
    d_cells = []
    for layer in range(n):
        w = cell_params[layer]["w"].astype(f32)
        u = cell_params[layer]["u"].astype(f32)
        b = cell_params[layer]["b"].astype(f32)
        x2 = flat(xs[layer])
        hp2 = flat(
            jnp.concatenate(
                [init_states[layer][None], h_seqs[layer][:-1]], axis=0
            )
        )
        da2 = flat(dacats[layer])
        # recompute r exactly as the kernels do (f32 math)
        r = jax.nn.sigmoid(
            _dot(x2, w[:, H : 2 * H]) + b[H : 2 * H]
            + _dot(hp2, u[:, H : 2 * H])
        )
        du = jnp.concatenate(
            [_outer_acc(hp2, da2[:, : 2 * H]),
             _outer_acc(r * hp2, da2[:, 2 * H :])],
            axis=-1,
        )
        d_cells.append({
            "w": _outer_acc(x2, da2),
            "u": du,
            "b": jnp.sum(da2, axis=0, keepdims=True),
        })
    return d_cells, {"w": dwo, "b": dbo}


# ===========================================================================
# LSTM whole-layer training kernels (mirror of gru_layer_train).
#
# Backward math per reverse step t (standard LSTM, act = tanh, as in
# models/cells.py LSTMCell):
#   recompute: [i,f,g,o] from (xp[t], h_{t-1});  tc = tanh(c_t)
#   dh = carry_h (+ dseq[t]);  dc = carry_c + dh*o*(1-tc^2)
#   do = dh*tc; di = dc*g; df = dc*c_{t-1}; dg = dc*i
#   da = [di*i(1-i), df*f(1-f), dg*(1-g^2), do*o(1-o)]
#   dxp[t] = da;  dU += h_{t-1}^T . da
#   carry_h = da . U^T;  carry_c = dc*f
# ===========================================================================

from .fused_lstm import (  # noqa: E402
    _encoder_scan_reference as _lstm_scan_reference,
)


def _lstm_fwd_kernel(xp_ref, h0_ref, c0_ref, u_ref, hseq_ref, cseq_ref,
                     h_s, c_s, *, act, taxis=0):
    # taxis: grid axis that walks time (see _fwd_kernel)
    import jax.experimental.pallas as pl

    from .fused_lstm import _lstm_gates

    step = pl.program_id(taxis)

    @pl.when(step == 0)
    def _init():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    new_h, new_c = _lstm_gates(xp_ref[0], h_s[:], c_s[:], u_ref[:], act)
    h_s[:] = new_h.astype(h_s.dtype)
    c_s[:] = new_c.astype(c_s.dtype)
    hseq_ref[0] = new_h.astype(hseq_ref.dtype)
    cseq_ref[0] = new_c.astype(cseq_ref.dtype)


def _lstm_fwd_pallas(xp, h0, c0, u, activation, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    T, B, _ = xp.shape
    H = h0.shape[-1]
    seq = lambda d: pl.BlockSpec((1, B, d), lambda t: (t, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, act=act),
        grid=(T,),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), xp.dtype),
            jax.ShapeDtypeStruct((T, B, H), xp.dtype),
        ),
        in_specs=[
            seq(4 * H),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(seq(H), seq(H)),
        scratch_shapes=[
            pltpu.VMEM((B, H), xp.dtype),
            pltpu.VMEM((B, H), xp.dtype),
        ],
        interpret=interpret,
    )(xp, h0, c0, u)


def _lstm_bwd_kernel(
    xp_ref, hseq_ref, cseq_prev_ref, cseq_ref, dseq_ref, dfinal_ref,
    h0_ref, c0_ref, u_ref,
    dxp_ref, dh0_ref, dc0_ref, du_ref,
    dh_s, dc_s,
    *, return_sequences,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)
    H = dh_s.shape[-1]
    last = pl.num_programs(0) - 1

    @pl.when(step == 0)
    def _init():
        du_ref[:] = jnp.zeros_like(du_ref)
        dc_s[:] = jnp.zeros_like(dc_s)
        if return_sequences:
            dh_s[:] = jnp.zeros_like(dh_s)
        else:
            dh_s[:] = dfinal_ref[:].astype(dh_s.dtype)

    xp = xp_ref[0].astype(jnp.float32)
    # h_{t-1}/c_{t-1} via shifted index maps on the forward sequences,
    # h0/c0 substituted at the final grid step (t=0) -- see _bwdx_kernel
    is_first_t = step == last
    hp = jnp.where(is_first_t, h0_ref[:], hseq_ref[0]).astype(jnp.float32)
    cp = jnp.where(is_first_t, c0_ref[:], cseq_prev_ref[0]).astype(jnp.float32)
    ct = cseq_ref[0].astype(jnp.float32)
    u = u_ref[:]

    gates = xp + _dot(hp, u)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    tc = jnp.tanh(ct)

    dh = dh_s[:].astype(jnp.float32)
    if return_sequences:
        dh = dh + dseq_ref[0].astype(jnp.float32)
    dc = dc_s[:].astype(jnp.float32) + dh * o * (1.0 - tc * tc)

    da = jnp.concatenate(
        [
            dc * g * i * (1.0 - i),
            dc * cp * f * (1.0 - f),
            dc * i * (1.0 - g * g),
            dh * tc * o * (1.0 - o),
        ],
        axis=-1,
    )
    dxp_ref[0] = da.astype(dxp_ref.dtype)
    du_ref[:] += _outer_acc(hp, da)
    new_dh = _dot_t(da, u)
    new_dc = dc * f
    dh_s[:] = new_dh
    dc_s[:] = new_dc

    @pl.when(step == last)
    def _final():
        dh0_ref[:] = new_dh.astype(dh0_ref.dtype)
        dc0_ref[:] = new_dc.astype(dc0_ref.dtype)


def _lstm_bwd_pallas(xp, h_seq, c_seq, h0, c0, d_seq, d_final, u,
                     return_sequences, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, _ = xp.shape
    H = u.shape[0]
    rev = lambda t: (T - 1 - t, 0, 0)  # noqa: E731

    return pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, return_sequences=return_sequences),
        grid=(T,),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, 4 * H), xp.dtype),   # dxp
            jax.ShapeDtypeStruct((B, H), xp.dtype),          # dh0
            jax.ShapeDtypeStruct((B, H), xp.dtype),          # dc0
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),   # du (f32 accum)
        ),
        in_specs=[
            pl.BlockSpec((1, B, 4 * H), rev, memory_space=pltpu.VMEM),
            _hprev_spec(T, B, H),                            # h seq (t-1)
            _hprev_spec(T, B, H),                            # c seq (t-1)
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),  # c_t
            pl.BlockSpec(
                (1, B, H),
                rev if return_sequences else (lambda t: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),           # dfinal
            pl.BlockSpec(memory_space=pltpu.VMEM),           # h0
            pl.BlockSpec(memory_space=pltpu.VMEM),           # c0
            pl.BlockSpec(memory_space=pltpu.VMEM),           # u
        ],
        out_specs=(
            pl.BlockSpec((1, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xp, h_seq, c_seq, c_seq, d_seq, d_final, h0, c0, u)


def _lstm_train_vmem_ok(B: int, H: int, itemsize: int = 4) -> bool:
    from .fused_gru import _VMEM_LIMIT_BYTES

    # operand: u + double-buffered xp/dxp + h/c seq + dseq blocks;
    # f32: du scratch, dh/dc carries, gate temps.
    operand = H * 4 * H + 2 * (2 * B * 4 * H + 4 * B * H)
    f32 = H * 4 * H + 2 * B * H + 8 * B * H
    return operand * itemsize + f32 * 4 < _VMEM_LIMIT_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def lstm_layer_train(
    xp, h0, c0, u, activation: str = "tanh", return_sequences: bool = False,
    interpret: bool = False,
):
    """LSTM layer over a full sequence: fused fwd AND fused bwd.

    xp: (T, B, 4H) precomputed x-projections; h0/c0: (B, H); returns
    (T, B, H) if return_sequences else the final h (B, H).

    Dispatch tiers as gru_layer_train: 'inplace' | 'wide' | 'scan'."""
    act = _activation(activation)
    mode = _lstm_mode(xp, h0, activation, interpret)
    if mode == "scan":
        return _lstm_scan_reference(xp, h0, c0, u, act, return_sequences)
    if mode == "wide":
        bt = _lstm_wide_btiles(xp.shape[1], h0.shape[-1], xp.dtype.itemsize)[0]
        h_seq, _ = _lstm_fwd_wide_pallas(
            xp, h0, c0, u, activation, interpret, bt or xp.shape[1]
        )
    else:
        h_seq, _ = _lstm_fwd_pallas(xp, h0, c0, u, activation, interpret)
    return h_seq if return_sequences else h_seq[-1]


def _llt_fwd(xp, h0, c0, u, activation, return_sequences, interpret):
    act = _activation(activation)
    mode = _lstm_mode(xp, h0, activation, interpret)
    if mode == "scan":
        out, vjp = jax.vjp(
            lambda a, b, c, d: _lstm_scan_reference(
                a, b, c, d, act, return_sequences
            ),
            xp, h0, c0, u,
        )
        return out, (vjp,)
    if mode == "wide":
        bt = _lstm_wide_btiles(xp.shape[1], h0.shape[-1], xp.dtype.itemsize)[0]
        h_seq, c_seq = _lstm_fwd_wide_pallas(
            xp, h0, c0, u, activation, interpret, bt or xp.shape[1]
        )
    else:
        h_seq, c_seq = _lstm_fwd_pallas(xp, h0, c0, u, activation, interpret)
    out = h_seq if return_sequences else h_seq[-1]
    return out, (xp, h0, c0, u, h_seq, c_seq)


def _llt_bwd(activation, return_sequences, interpret, residuals, g):
    if len(residuals) == 1:
        (vjp,) = residuals
        return vjp(g)
    xp, h0, c0, u, h_seq, c_seq = residuals
    if return_sequences:
        d_seq = g
        d_final = jnp.zeros_like(h0)
    else:
        d_seq = jnp.zeros_like(h_seq[:1])  # dummy block, never read
        d_final = g
    if _lstm_mode(xp, h0, activation, interpret) == "wide":
        bt = _lstm_wide_btiles(xp.shape[1], u.shape[0], xp.dtype.itemsize)[1]
        dacat, dh0, dc0 = _lstm_bwd_wide_pallas(
            xp, h_seq, c_seq, h0, c0, d_seq, d_final, u,
            return_sequences, interpret, bt or xp.shape[1],
        )
        du = _lstm_wide_weight_grads(h_seq, h0, dacat)
        return dacat, dh0, dc0, du.astype(u.dtype)
    dxp, dh0, dc0, du = _lstm_bwd_pallas(
        xp, h_seq, c_seq, h0, c0, d_seq, d_final, u,
        return_sequences, interpret,
    )
    return dxp, dh0, dc0, du.astype(u.dtype)


lstm_layer_train.defvjp(_llt_fwd, _llt_bwd)


# ===========================================================================
# WIDE-MODEL two-pass training backward.
#
# The in-place backward kernels above keep the weight gradient dU -- an
# (H, 3H/4H) f32 accumulator -- resident in VMEM next to U itself, which
# stops fitting the 16 MB core as H grows (f32 H=512 hits a 17.6 MB
# scoped-vmem allocation under the AOT compiler; H=1024 cannot fit U + dU at
# all: 2 x 12.6 MB f32). The wide variant splits the backward into
#
#   pass 1 (Pallas, the only SERIAL part): the same reverse-time scan
#     transpose, but emitting ONLY the per-step pre-activation gate grads
#     da_cat (T, B, 3H/4H) == dxp and the carry grads dh0 (+dc0) -- no
#     weight-grad residency at all -- with the batch tiled over an outer
#     grid axis (grid (nB, T): U stays VMEM-resident once across all tiles,
#     every per-step block shrinks by nB);
#
#   pass 2 (XLA, embarrassingly parallel): the weight grads as flat
#     (T*B, .) matmuls on the MXU --
#       GRU:  dU_zr = h_prev^T . da_zr,  dU_h = (r*h_prev)^T . da
#             (r recomputed from xp_r + h_prev.U_r; one extra (T*B,H)x(H,H))
#       LSTM: dU = h_prev^T . da_cat    (nothing to recompute)
#     plus dxp = da_cat verbatim.
#
# This trades one extra HBM round trip of da_cat for ~(H*G*H + temps) bytes
# of VMEM, admitting fused training at widths the in-place kernels reject.
# Dispatch order: in-place if it fits (fewer HBM streams), else wide, else
# the XLA scan.
# ===========================================================================

_WIDE_BUDGET_BYTES = 15_500_000  # of the 16 MB v5e core; see anchors below
_FORCE_TRAIN_MODE: str | None = None  # test hook: None|"inplace"|"wide"|"scan"

# Mosaic's temporary VMEM per bt*H unit, CALIBRATED against compile probes
# on the v5e AOT compiler (the stricter context) at (T=64, B=256):
#   GRU bwd f32 H=1024: bt=16 compiles, bt=32 OOMs  -> 26 < Kb_f32 <= 131
#   GRU bwd bf16 H=1024: bt=32 compiles, bt=64 OOMs -> 105 < Kb_bf16 <= 260
#   GRU fwd f32 H=1024: bt=64 compiles, bt=128 OOMs (by operands alone)
# bf16 temps are ~3x f32's: every streamed block is cast to an f32 copy for
# the gate math, which f32 reuses in place. The chosen values respect every
# anchor (conservatively where ranges allow).
_TEMPS_FWD = {4: 12, 2: 24}   # bytes per bt*H, keyed by operand itemsize
_TEMPS_BWD = {4: 34, 2: 109}


def _btile(B: int, fits) -> int:
    """Largest power-of-two-descending divisor tile of B accepted by
    ``fits``; 0 if none (>= 8 rows keeps the sublane dimension aligned)."""
    bt = B
    while bt >= 8:
        if B % bt == 0 and fits(bt):
            return bt
        bt //= 2
    return 0


def _gru_fwd_wide_bytes(bt: int, H: int, s: int) -> int:
    # exact operands: u resident + double-buffered xp-in/seq-out streams +
    # h0 block + carry scratch; calibrated temps
    return (
        H * 3 * H * s
        + (2 * bt * 3 * H + 2 * bt * H) * s
        + 2 * bt * H * s
        + _TEMPS_FWD[min(s, 4)] * bt * H
    )


def _gru_bwd_wide_bytes(bt: int, H: int, s: int) -> int:
    # exact operands: u resident + double-buffered xp/dacat/hseq/dseq streams
    # + pinned h0/dfinal/dh0 + f32 dh carry; calibrated temps
    return (
        H * 3 * H * s
        + (4 * bt * 3 * H + 4 * bt * H) * s
        + 3 * bt * H * s
        + 4 * bt * H
        + _TEMPS_BWD[min(s, 4)] * bt * H
    )


def _gru_wide_btiles(B: int, H: int, s: int) -> tuple[int, int]:
    """(fwd_btile, bwd_btile), or (0, 0) when either pass cannot fit."""
    fwd = _btile(B, lambda bt: _gru_fwd_wide_bytes(bt, H, s) < _WIDE_BUDGET_BYTES)
    bwd = _btile(B, lambda bt: _gru_bwd_wide_bytes(bt, H, s) < _WIDE_BUDGET_BYTES)
    return (fwd, bwd) if fwd and bwd else (0, 0)


def _gru_mode(xp, h0, activation, interpret) -> str:
    """'inplace' | 'wide' | 'scan' for gru_layer_train's three paths."""
    if activation != "tanh":  # bwd kernels hardcode the tanh derivative
        return "scan"
    if _FORCE_TRAIN_MODE is not None:
        return _FORCE_TRAIN_MODE
    if interpret:
        return "inplace"
    if jax.default_backend() != "tpu":
        return "scan"
    B, H, s = xp.shape[1], h0.shape[-1], xp.dtype.itemsize
    if _train_vmem_ok(B, H, s):
        return "inplace"
    if _gru_wide_btiles(B, H, s)[0]:
        return "wide"
    return "scan"


def _hprev_spec_tiled(T, bt, H):
    """Batch-tiled twin of _hprev_spec for the (nB, T) reverse grid."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(
        (1, bt, H),
        lambda b, s: (jnp.maximum(T - 2 - s, 0), b, 0),
        memory_space=pltpu.VMEM,
    )


def _fwd_wide_pallas(xp, h0, u, activation, interpret, bt):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    T, B, _ = xp.shape
    H = h0.shape[-1]
    seq3 = lambda b, s: (s, b, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_fwd_kernel, act=act, taxis=1),
        grid=(B // bt, T),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xp.dtype),
        in_specs=[
            pl.BlockSpec((1, bt, 3 * H), seq3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H), lambda b, s: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, H), seq3, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bt, H), xp.dtype)],
        interpret=interpret,
    )(xp, h0, u)


def _bwd_wide_kernel(
    xp_ref, hseq_ref, h0_ref, dseq_ref, dfinal_ref, u_ref,
    dacat_ref, dh0_ref,
    dh_s,
    *, return_sequences,
):
    """_bwd_kernel minus the dU residency: same reverse-time gate math,
    emitting the pre-activation gate grads (== dxp) for pass 2."""
    import jax.experimental.pallas as pl

    step = pl.program_id(1)           # 0 .. T-1, walking t = T-1 .. 0
    H = dh_s.shape[-1]
    last = pl.num_programs(1) - 1

    @pl.when(step == 0)
    def _init():
        if return_sequences:
            dh_s[:] = jnp.zeros_like(dh_s)
        else:
            dh_s[:] = dfinal_ref[:].astype(dh_s.dtype)

    xp = xp_ref[0]
    h = jnp.where(step == last, h0_ref[:], hseq_ref[0])
    u = u_ref[:]

    hu_zr = _dot(h, u[:, : 2 * H])
    z = jax.nn.sigmoid(xp[:, :H].astype(jnp.float32) + hu_zr[:, :H])
    r = jax.nn.sigmoid(xp[:, H : 2 * H].astype(jnp.float32) + hu_zr[:, H:])
    rh = r * h.astype(jnp.float32)
    hh = jnp.tanh(xp[:, 2 * H :].astype(jnp.float32) + _dot(rh, u[:, 2 * H :]))

    dh = dh_s[:].astype(jnp.float32)
    if return_sequences:
        dh = dh + dseq_ref[0].astype(jnp.float32)

    dz = dh * (h.astype(jnp.float32) - hh)
    da = dh * (1.0 - z) * (1.0 - hh * hh)
    drh = _dot_t(da, u[:, 2 * H :])
    dr = drh * h.astype(jnp.float32)
    da_z = dz * z * (1.0 - z)
    da_r = dr * r * (1.0 - r)
    da_zr = jnp.concatenate([da_z, da_r], axis=-1)

    dacat_ref[0] = jnp.concatenate([da_zr, da], axis=-1).astype(dacat_ref.dtype)
    new_dh = dh * z + drh * r + _dot_t(da_zr, u[:, : 2 * H])
    dh_s[:] = new_dh.astype(dh_s.dtype)

    @pl.when(step == last)
    def _final():
        dh0_ref[:] = new_dh.astype(dh0_ref.dtype)


def _bwd_wide_pallas(xp, seq, h0, d_seq, d_final, u, return_sequences,
                     interpret, bt):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, _ = xp.shape
    H = u.shape[0]
    rev3 = lambda b, s: (T - 1 - s, b, 0)  # noqa: E731
    brow = lambda b, s: (b, 0)  # noqa: E731

    out_shape = (
        jax.ShapeDtypeStruct((T, B, 3 * H), xp.dtype),   # da_cat == dxp
        jax.ShapeDtypeStruct((B, H), xp.dtype),          # dh0
    )
    return pl.pallas_call(
        functools.partial(_bwd_wide_kernel, return_sequences=return_sequences),
        grid=(B // bt, T),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec((1, bt, 3 * H), rev3, memory_space=pltpu.VMEM),
            _hprev_spec_tiled(T, bt, H),                               # h seq
            pl.BlockSpec((bt, H), brow, memory_space=pltpu.VMEM),      # h0
            pl.BlockSpec(
                (1, bt, H),
                rev3 if return_sequences else (lambda b, s: (0, b, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bt, H), brow, memory_space=pltpu.VMEM),      # dfinal
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # u
        ],
        out_specs=(
            pl.BlockSpec((1, bt, 3 * H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H), brow, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),       # dh carry
        ],
        interpret=interpret,
    )(xp, seq, h0, d_seq, d_final, u)


def _gru_wide_weight_grads(xp, seq, h0, u, dacat):
    """Pass 2: dU from the pass-1 gate grads as flat MXU matmuls (f32).

    Precision: the pass-1 ``dacat`` stream is stored in the compute dtype,
    so under bf16 the weight grads are standard mixed precision (bf16
    operands, f32 MXU accumulation) — unlike the in-place kernels, which
    accumulate dU from unrounded f32 ``da``. Both paths cast the result to
    u.dtype; the wide-vs-inplace difference is below that final-cast
    rounding (locked by TestWideTwoPassTrain bf16 parity tests)."""
    T, B, _ = xp.shape
    H = u.shape[0]
    f32 = jnp.float32
    hp = jnp.concatenate([h0[None], seq[:-1]], axis=0).reshape(T * B, H)
    da2 = dacat.reshape(T * B, 3 * H).astype(f32)
    # the candidate-gate weight grad needs r*h_prev; recompute r exactly as
    # the kernels do (f32 math)
    r = jax.nn.sigmoid(
        xp[..., H : 2 * H].reshape(T * B, H).astype(f32)
        + _dot(hp, u[:, H : 2 * H])
    )
    du_zr = _outer_acc(hp.astype(f32), da2[:, : 2 * H])
    du_h = _outer_acc(r * hp.astype(f32), da2[:, 2 * H :])
    return jnp.concatenate([du_zr, du_h], axis=-1)


# ---- LSTM wide twins ----

def _lstm_fwd_wide_bytes(bt: int, H: int, s: int) -> int:
    # exact operands: u + xp-in/hseq-out/cseq-out streams + h0/c0 +
    # 2 carry scratches; temps scaled 4/3 from the GRU calibration
    return (
        H * 4 * H * s
        + (2 * bt * 4 * H + 4 * bt * H) * s
        + 4 * bt * H * s
        + _TEMPS_FWD[min(s, 4)] * bt * H * 4 // 3
    )


def _lstm_bwd_wide_bytes(bt: int, H: int, s: int) -> int:
    # exact operands: u + xp/dacat streams + hprev/cprev/ct/dseq blocks +
    # pinned h0/c0/dfinal/dh0/dc0 + f32 dh/dc carries; temps scaled 4/3
    return (
        H * 4 * H * s
        + (4 * bt * 4 * H + 8 * bt * H) * s
        + 5 * bt * H * s
        + 8 * bt * H
        + _TEMPS_BWD[min(s, 4)] * bt * H * 4 // 3
    )


def _lstm_wide_btiles(B: int, H: int, s: int) -> tuple[int, int]:
    fwd = _btile(
        B, lambda bt: _lstm_fwd_wide_bytes(bt, H, s) < _WIDE_BUDGET_BYTES
    )
    bwd = _btile(
        B, lambda bt: _lstm_bwd_wide_bytes(bt, H, s) < _WIDE_BUDGET_BYTES
    )
    return (fwd, bwd) if fwd and bwd else (0, 0)


def _lstm_mode(xp, h0, activation, interpret) -> str:
    if activation != "tanh":
        return "scan"
    if _FORCE_TRAIN_MODE is not None:
        return _FORCE_TRAIN_MODE
    if interpret:
        return "inplace"
    if jax.default_backend() != "tpu":
        return "scan"
    B, H, s = xp.shape[1], h0.shape[-1], xp.dtype.itemsize
    if _lstm_train_vmem_ok(B, H, s):
        return "inplace"
    if _lstm_wide_btiles(B, H, s)[0]:
        return "wide"
    return "scan"


def _lstm_fwd_wide_pallas(xp, h0, c0, u, activation, interpret, bt):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    T, B, _ = xp.shape
    H = h0.shape[-1]
    seq = lambda d: pl.BlockSpec((1, bt, d), lambda b, s: (s, b, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    brow = pl.BlockSpec((bt, H), lambda b, s: (b, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, act=act, taxis=1),
        grid=(B // bt, T),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), xp.dtype),
            jax.ShapeDtypeStruct((T, B, H), xp.dtype),
        ),
        in_specs=[
            seq(4 * H),
            brow,
            brow,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(seq(H), seq(H)),
        scratch_shapes=[
            pltpu.VMEM((bt, H), xp.dtype),
            pltpu.VMEM((bt, H), xp.dtype),
        ],
        interpret=interpret,
    )(xp, h0, c0, u)


def _lstm_bwd_wide_kernel(
    xp_ref, hseq_ref, cseq_prev_ref, cseq_ref, dseq_ref, dfinal_ref,
    h0_ref, c0_ref, u_ref,
    dacat_ref, dh0_ref, dc0_ref,
    dh_s, dc_s,
    *, return_sequences,
):
    """_lstm_bwd_kernel minus the dU residency (see _bwd_wide_kernel)."""
    import jax.experimental.pallas as pl

    step = pl.program_id(1)
    H = dh_s.shape[-1]
    last = pl.num_programs(1) - 1

    @pl.when(step == 0)
    def _init():
        dc_s[:] = jnp.zeros_like(dc_s)
        if return_sequences:
            dh_s[:] = jnp.zeros_like(dh_s)
        else:
            dh_s[:] = dfinal_ref[:].astype(dh_s.dtype)

    xp = xp_ref[0].astype(jnp.float32)
    is_first_t = step == last
    hp = jnp.where(is_first_t, h0_ref[:], hseq_ref[0]).astype(jnp.float32)
    cp = jnp.where(is_first_t, c0_ref[:], cseq_prev_ref[0]).astype(jnp.float32)
    ct = cseq_ref[0].astype(jnp.float32)
    u = u_ref[:]

    gates = xp + _dot(hp, u)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    tc = jnp.tanh(ct)

    dh = dh_s[:].astype(jnp.float32)
    if return_sequences:
        dh = dh + dseq_ref[0].astype(jnp.float32)
    dc = dc_s[:].astype(jnp.float32) + dh * o * (1.0 - tc * tc)

    da = jnp.concatenate(
        [
            dc * g * i * (1.0 - i),
            dc * cp * f * (1.0 - f),
            dc * i * (1.0 - g * g),
            dh * tc * o * (1.0 - o),
        ],
        axis=-1,
    )
    dacat_ref[0] = da.astype(dacat_ref.dtype)
    new_dh = _dot_t(da, u)
    new_dc = dc * f
    dh_s[:] = new_dh
    dc_s[:] = new_dc

    @pl.when(step == last)
    def _final():
        dh0_ref[:] = new_dh.astype(dh0_ref.dtype)
        dc0_ref[:] = new_dc.astype(dc0_ref.dtype)


def _lstm_bwd_wide_pallas(xp, h_seq, c_seq, h0, c0, d_seq, d_final, u,
                          return_sequences, interpret, bt):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, _ = xp.shape
    H = u.shape[0]
    rev = lambda b, s: (T - 1 - s, b, 0)  # noqa: E731
    brow = pl.BlockSpec((bt, H), lambda b, s: (b, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _lstm_bwd_wide_kernel, return_sequences=return_sequences
        ),
        grid=(B // bt, T),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, 4 * H), xp.dtype),   # da_cat == dxp
            jax.ShapeDtypeStruct((B, H), xp.dtype),          # dh0
            jax.ShapeDtypeStruct((B, H), xp.dtype),          # dc0
        ),
        in_specs=[
            pl.BlockSpec((1, bt, 4 * H), rev, memory_space=pltpu.VMEM),
            _hprev_spec_tiled(T, bt, H),                     # h seq (t-1)
            _hprev_spec_tiled(T, bt, H),                     # c seq (t-1)
            pl.BlockSpec((1, bt, H), rev, memory_space=pltpu.VMEM),  # c_t
            pl.BlockSpec(
                (1, bt, H),
                rev if return_sequences else (lambda b, s: (0, b, 0)),
                memory_space=pltpu.VMEM,
            ),
            brow,                                            # dfinal
            brow,                                            # h0
            brow,                                            # c0
            pl.BlockSpec(memory_space=pltpu.VMEM),           # u
        ],
        out_specs=(
            pl.BlockSpec((1, bt, 4 * H), rev, memory_space=pltpu.VMEM),
            brow,
            brow,
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),
            pltpu.VMEM((bt, H), jnp.float32),
        ],
        interpret=interpret,
    )(xp, h_seq, c_seq, c_seq, d_seq, d_final, h0, c0, u)


def _lstm_wide_weight_grads(h_seq, h0, dacat):
    """Pass 2: dU = h_prev^T . da_cat as one flat MXU matmul (f32).

    bf16 precision semantics as in _gru_wide_weight_grads: the stream is
    stored rounded to the compute dtype, accumulation stays f32."""
    T, B, _ = dacat.shape
    H = h0.shape[-1]
    f32 = jnp.float32
    hp = jnp.concatenate([h0[None], h_seq[:-1]], axis=0).reshape(T * B, H)
    return _outer_acc(
        hp.astype(f32), dacat.reshape(T * B, 4 * H).astype(f32)
    )


# ===========================================================================
# In-kernel x-projection variants: the layer kernels above stream the
# PRECOMPUTED xp (T, B, 3H/4H) -- at reference scale that materializes
# ~50 MB per layer per direction in HBM (and a grotesque 768x inflation for
# the 1-dim velocity encoder input). The step is HBM-bandwidth-bound (XLA
# cost model: 24 GFLOP but 2.3 GB accessed -> 534 GB/s of the v5e's
# ~819 GB/s at the measured 4.3 ms), so these variants keep W/b resident in
# VMEM and compute x@W per step on the otherwise-idle MXU: the streams
# shrink from (T,B,3H) to (T,B,Din) both ways.
# ===========================================================================

def _fwdx_kernel(x_ref, h0_ref, w_ref, b_ref, u_ref, seq_ref, h_s, *, act,
                 cast_x=False):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h_s[:] = h0_ref[:]

    h = h_s[:]
    H = h.shape[-1]
    # cast_x: degenerate-K projections (D < 8, e.g. the 1-dim velocity
    # input) lower to a broadcast-multiply, and Mosaic cannot broadcast a
    # bf16 operand into the f32 result -- run those in f32 (w/b are cast by
    # the wrapper; K<8 gets no MXU benefit from bf16 anyway)
    x = x_ref[0].astype(jnp.float32) if cast_x else x_ref[0]
    xp = _dot(x, w_ref[:]) + b_ref[:].astype(jnp.float32)
    hu_zr = _dot(h, u_ref[:, : 2 * H])
    z = jax.nn.sigmoid(xp[:, :H] + hu_zr[:, :H])
    r = jax.nn.sigmoid(xp[:, H : 2 * H] + hu_zr[:, H:])
    hh = act(xp[:, 2 * H :] + _dot(r * h, u_ref[:, 2 * H :]))
    new_h = z * h + (1.0 - z) * hh
    h_s[:] = new_h.astype(h_s.dtype)
    seq_ref[0] = new_h.astype(seq_ref.dtype)


def _fwdx_pallas(x, h0, w, b, u, activation, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    # 1-D bias enters the kernel in f32: an in-kernel astype gets folded
    # into the broadcast by Mosaic, producing invalid mixed-type IR
    b = b.astype(jnp.float32)
    T, B, D = x.shape
    cast_x = D < 8 and x.dtype != jnp.float32
    if cast_x:
        w = w.astype(jnp.float32)
    H = h0.shape[-1]
    return pl.pallas_call(
        functools.partial(_fwdx_kernel, act=act, cast_x=cast_x),
        grid=(T,),
        out_shape=jax.ShapeDtypeStruct((T, B, H), x.dtype),
        in_specs=[
            pl.BlockSpec((1, B, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, H), x.dtype)],
        interpret=interpret,
    )(x, h0, w, b, u)


def _bwdx_kernel(
    x_ref, hseq_ref, h0_ref, dseq_ref, dfinal_ref, w_ref, b_ref, u_ref,
    dx_ref, dh0_ref, dw_ref, db_ref, du_ref,
    dh_s,
    *, return_sequences,
):
    """Reverse-time scan transpose; grid step s walks t = T-1 .. 0.

    h_{t-1} comes straight from the forward's h sequence via a SHIFTED block
    index map (hseq_ref block = seq[max(T-2-s, 0)]), with h0 substituted at
    the last grid step (t=0) -- no concatenated h_prev buffer in HBM. The
    weight/bias grads accumulate directly in their pinned f32 output refs
    (constant index maps keep them VMEM-resident) instead of a separate
    scratch + final copy, halving the kernel's grad VMEM footprint."""
    import jax.experimental.pallas as pl

    step = pl.program_id(0)
    H = dh_s.shape[-1]
    last = pl.num_programs(0) - 1

    @pl.when(step == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        du_ref[:] = jnp.zeros_like(du_ref)
        if return_sequences:
            dh_s[:] = jnp.zeros_like(dh_s)
        else:
            dh_s[:] = dfinal_ref[:].astype(dh_s.dtype)

    x = x_ref[0].astype(jnp.float32)
    h = jnp.where(
        step == last,
        h0_ref[:].astype(jnp.float32),
        hseq_ref[0].astype(jnp.float32),
    )
    u = u_ref[:]

    xp = _dot(x, w_ref[:]) + b_ref[:].astype(jnp.float32)
    hu_zr = _dot(h, u[:, : 2 * H])
    z = jax.nn.sigmoid(xp[:, :H] + hu_zr[:, :H])
    r = jax.nn.sigmoid(xp[:, H : 2 * H] + hu_zr[:, H:])
    rh = r * h
    hh = jnp.tanh(xp[:, 2 * H :] + _dot(rh, u[:, 2 * H :]))

    dh = dh_s[:].astype(jnp.float32)
    if return_sequences:
        dh = dh + dseq_ref[0].astype(jnp.float32)

    dz = dh * (h - hh)
    da = dh * (1.0 - z) * (1.0 - hh * hh)
    drh = _dot_t(da, u[:, 2 * H :])
    dr = drh * h
    da_z = dz * z * (1.0 - z)
    da_r = dr * r * (1.0 - r)
    da_zr = jnp.concatenate([da_z, da_r], axis=-1)
    da_cat = jnp.concatenate([da_zr, da], axis=-1)

    dx_ref[0] = _dot_t(da_cat, w_ref[:]).astype(dx_ref.dtype)
    dw_ref[:] += _outer_acc(x, da_cat)
    db_ref[:] += jnp.sum(da_cat, axis=0, keepdims=True)
    du_ref[:, : 2 * H] += _outer_acc(h, da_zr)
    du_ref[:, 2 * H :] += _outer_acc(rh, da)

    new_dh = dh * z + drh * r + _dot_t(da_zr, u[:, : 2 * H])
    dh_s[:] = new_dh.astype(dh_s.dtype)

    @pl.when(step == last)
    def _final():
        dh0_ref[:] = new_dh.astype(dh0_ref.dtype)


def _hprev_spec(T, B, H):
    """Block spec reading seq[t-1] on the reverse grid (seq[0] at t=0 --
    the kernel substitutes h0 there)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(
        (1, B, H),
        lambda s: (jnp.maximum(T - 2 - s, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )


def _bwdx_pallas(x, seq, h0, d_seq, d_final, w, b, u, return_sequences,
                 interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = b.astype(jnp.float32)  # see _fwdx_pallas
    T, B, D = x.shape
    if D < 8 and x.dtype != jnp.float32:
        w = w.astype(jnp.float32)  # degenerate-K dot: see _fwdx_kernel
    H = u.shape[0]
    f32 = jnp.float32
    rev = lambda t: (T - 1 - t, 0, 0)  # noqa: E731

    return pl.pallas_call(
        functools.partial(_bwdx_kernel, return_sequences=return_sequences),
        grid=(T,),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, D), x.dtype),        # dx
            jax.ShapeDtypeStruct((B, H), x.dtype),           # dh0
            # weight/bias grads in f32 (bf16 stores with odd row counts /
            # 1-row bias rows hit Mosaic's unimplemented subelement masking;
            # the accumulation is f32 anyway) -- cast in _glx_bwd
            jax.ShapeDtypeStruct((D, 3 * H), jnp.float32),   # dw
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),   # db (2-D row)
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),   # du
        ),
        in_specs=[
            pl.BlockSpec((1, B, D), rev, memory_space=pltpu.VMEM),
            _hprev_spec(T, B, H),                            # fwd h seq
            pl.BlockSpec(memory_space=pltpu.VMEM),           # h0
            pl.BlockSpec(
                (1, B, H),
                rev if return_sequences else (lambda t: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),           # dfinal
            pl.BlockSpec(memory_space=pltpu.VMEM),           # w
            pl.BlockSpec(memory_space=pltpu.VMEM),           # b
            pl.BlockSpec(memory_space=pltpu.VMEM),           # u
        ],
        out_specs=(
            pl.BlockSpec((1, B, D), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), f32),
        ],
        interpret=interpret,
    )(x, seq, h0, d_seq, d_final, w, b, u)


def _x_train_vmem_ok(B: int, D: int, H: int, itemsize: int = 4) -> bool:
    operand = (
        D * 3 * H + H * 3 * H + 3 * H         # w/u/b
        + 2 * (2 * B * D + 2 * B * H)         # double-buffered x/dx streams
    )
    f32 = (
        2 * (D * 3 * H + H * 3 * H + 3 * H)   # dw/du/db scratch + pinned
        + 8 * B * H + 2 * B * 3 * H           # temps + carry
    )
    # verified to compile at reference scale on v5e (16 MB/core)
    return operand * itemsize + f32 * 4 < 15_500_000


def _x_use_pallas(x, h0, activation, interpret) -> bool:
    if activation != "tanh":  # bwd kernels hardcode the tanh derivative
        return False
    if interpret:
        return True
    return (
        jax.default_backend() == "tpu"
        and activation == "tanh"
        and _x_train_vmem_ok(
            x.shape[1], x.shape[2], h0.shape[-1], x.dtype.itemsize
        )
    )


def _gru_layer_fallback_x(x, h0, w, b, u, activation, return_sequences,
                          interpret):
    """When the in-kernel-projection variant doesn't fit VMEM, precompute xp
    and use the xp-streaming kernel (which itself falls back to jnp)."""
    T, B, D = x.shape
    xp = (x.reshape(T * B, D) @ w + b).reshape(T, B, -1)
    return gru_layer_train(xp, h0, u, activation, return_sequences, interpret)


def _gru_layer_reference_x(x, h0, w, b, u, act, return_sequences):
    T, B, D = x.shape
    xp = (x.reshape(T * B, D) @ w + b).reshape(T, B, -1)
    return _encoder_scan_reference(xp, h0, u, act, return_sequences)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gru_layer_train_x(
    x, h0, w, b, u, activation: str = "tanh", return_sequences: bool = False,
    interpret: bool = False,
):
    """GRU layer with IN-KERNEL x-projection: fused fwd AND fused bwd.

    x: (T, B, D) raw time-major inputs (NOT the projected gates); W/b stay
    resident in VMEM and x@W happens per step inside the kernel, so the HBM
    streams are (T,B,D) instead of (T,B,3H) in both directions."""
    if not _x_use_pallas(x, h0, activation, interpret):
        return _gru_layer_fallback_x(
            x, h0, w, b, u, activation, return_sequences, interpret
        )
    seq = _fwdx_pallas(x, h0, w, b, u, activation, interpret)
    return seq if return_sequences else seq[-1]


def _glx_fwd(x, h0, w, b, u, activation, return_sequences, interpret):
    if not _x_use_pallas(x, h0, activation, interpret):
        out, vjp = jax.vjp(
            lambda a, b_, c, d, e: _gru_layer_fallback_x(
                a, b_, c, d, e, activation, return_sequences, interpret
            ),
            x, h0, w, b, u,
        )
        return out, (vjp,)
    seq = _fwdx_pallas(x, h0, w, b, u, activation, interpret)
    out = seq if return_sequences else seq[-1]
    return out, (x, h0, w, b, u, seq)


def _glx_bwd(activation, return_sequences, interpret, residuals, g):
    if len(residuals) == 1:
        (vjp,) = residuals
        return vjp(g)
    x, h0, w, b, u, seq = residuals
    if return_sequences:
        d_seq = g
        d_final = jnp.zeros_like(h0)
    else:
        d_seq = jnp.zeros_like(seq[:1])
        d_final = g
    dx, dh0, dw, db, du = _bwdx_pallas(
        x, seq, h0, d_seq, d_final, w, b, u, return_sequences, interpret
    )
    return (dx, dh0, dw.astype(w.dtype), db[0].astype(b.dtype),
            du.astype(u.dtype))


gru_layer_train_x.defvjp(_glx_fwd, _glx_bwd)


# ---- LSTM analog of the in-kernel x-projection layer kernels ----

def _lstm_fwdx_kernel(x_ref, h0_ref, c0_ref, w_ref, b_ref, u_ref,
                      hseq_ref, cseq_ref, h_s, c_s, *, act, cast_x=False):
    import jax.experimental.pallas as pl

    from .fused_lstm import _lstm_gates

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    x = x_ref[0].astype(jnp.float32) if cast_x else x_ref[0]
    xp = _dot(x, w_ref[:]) + b_ref[:].astype(jnp.float32)
    new_h, new_c = _lstm_gates(xp, h_s[:], c_s[:], u_ref[:], act)
    h_s[:] = new_h.astype(h_s.dtype)
    c_s[:] = new_c.astype(c_s.dtype)
    hseq_ref[0] = new_h.astype(hseq_ref.dtype)
    cseq_ref[0] = new_c.astype(cseq_ref.dtype)


def _lstm_fwdx_pallas(x, h0, c0, w, b, u, activation, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    b = b.astype(jnp.float32)  # see _fwdx_pallas
    T, B, D = x.shape
    cast_x = D < 8 and x.dtype != jnp.float32
    if cast_x:
        w = w.astype(jnp.float32)  # degenerate-K dot: see _fwdx_kernel
    H = h0.shape[-1]
    seq = lambda d: pl.BlockSpec((1, B, d), lambda t: (t, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lstm_fwdx_kernel, act=act, cast_x=cast_x),
        grid=(T,),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
        ),
        in_specs=[seq(D), vm, vm, vm, vm, vm],
        out_specs=(seq(H), seq(H)),
        scratch_shapes=[
            pltpu.VMEM((B, H), x.dtype),
            pltpu.VMEM((B, H), x.dtype),
        ],
        interpret=interpret,
    )(x, h0, c0, w, b, u)


def _lstm_bwdx_kernel(
    x_ref, hseq_ref, cseq_prev_ref, cseq_ref, dseq_ref, dfinal_ref,
    h0_ref, c0_ref, w_ref, b_ref, u_ref,
    dx_ref, dh0_ref, dc0_ref, dw_ref, db_ref, du_ref,
    dh_s, dc_s,
    *, return_sequences,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)
    H = dh_s.shape[-1]
    last = pl.num_programs(0) - 1

    @pl.when(step == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        du_ref[:] = jnp.zeros_like(du_ref)
        dc_s[:] = jnp.zeros_like(dc_s)
        if return_sequences:
            dh_s[:] = jnp.zeros_like(dh_s)
        else:
            dh_s[:] = dfinal_ref[:].astype(dh_s.dtype)

    x = x_ref[0].astype(jnp.float32)
    is_first_t = step == last
    hp = jnp.where(is_first_t, h0_ref[:], hseq_ref[0]).astype(jnp.float32)
    cp = jnp.where(is_first_t, c0_ref[:], cseq_prev_ref[0]).astype(jnp.float32)
    ct = cseq_ref[0].astype(jnp.float32)
    u = u_ref[:]

    gates = _dot(x, w_ref[:]) + b_ref[:].astype(jnp.float32) + _dot(hp, u)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    tc = jnp.tanh(ct)

    dh = dh_s[:].astype(jnp.float32)
    if return_sequences:
        dh = dh + dseq_ref[0].astype(jnp.float32)
    dc = dc_s[:].astype(jnp.float32) + dh * o * (1.0 - tc * tc)

    da = jnp.concatenate(
        [
            dc * g * i * (1.0 - i),
            dc * cp * f * (1.0 - f),
            dc * i * (1.0 - g * g),
            dh * tc * o * (1.0 - o),
        ],
        axis=-1,
    )
    dx_ref[0] = _dot_t(da, w_ref[:]).astype(dx_ref.dtype)
    dw_ref[:] += _outer_acc(x, da)
    db_ref[:] += jnp.sum(da, axis=0, keepdims=True)
    du_ref[:] += _outer_acc(hp, da)
    new_dh = _dot_t(da, u)
    new_dc = dc * f
    dh_s[:] = new_dh
    dc_s[:] = new_dc

    @pl.when(step == last)
    def _final():
        dh0_ref[:] = new_dh.astype(dh0_ref.dtype)
        dc0_ref[:] = new_dc.astype(dc0_ref.dtype)


def _lstm_bwdx_pallas(x, h_seq, c_seq, h0, c0, d_seq, d_final,
                      w, b, u, return_sequences, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = b.astype(jnp.float32)  # see _fwdx_pallas
    T, B, D = x.shape
    if D < 8 and x.dtype != jnp.float32:
        w = w.astype(jnp.float32)  # degenerate-K dot: see _fwdx_kernel
    H = u.shape[0]
    f32 = jnp.float32
    rev = lambda t: (T - 1 - t, 0, 0)  # noqa: E731

    return pl.pallas_call(
        functools.partial(
            _lstm_bwdx_kernel, return_sequences=return_sequences
        ),
        grid=(T,),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, D), x.dtype),
            jax.ShapeDtypeStruct((B, H), x.dtype),
            jax.ShapeDtypeStruct((B, H), x.dtype),
            # weight/bias grads in f32 (see _bwdx_pallas) -- cast in _llx_bwd
            jax.ShapeDtypeStruct((D, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, B, D), rev, memory_space=pltpu.VMEM),
            _hprev_spec(T, B, H),                            # h seq (t-1)
            _hprev_spec(T, B, H),                            # c seq (t-1)
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),  # c_t
            pl.BlockSpec(
                (1, B, H),
                rev if return_sequences else (lambda t: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),           # dfinal
            pl.BlockSpec(memory_space=pltpu.VMEM),           # h0
            pl.BlockSpec(memory_space=pltpu.VMEM),           # c0
            pl.BlockSpec(memory_space=pltpu.VMEM),           # w
            pl.BlockSpec(memory_space=pltpu.VMEM),           # b
            pl.BlockSpec(memory_space=pltpu.VMEM),           # u
        ],
        out_specs=(
            pl.BlockSpec((1, B, D), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), f32),
            pltpu.VMEM((B, H), f32),
        ],
        interpret=interpret,
    )(x, h_seq, c_seq, c_seq, d_seq, d_final, h0, c0, w, b, u)


def _lstm_x_train_vmem_ok(B: int, D: int, H: int, itemsize: int = 4) -> bool:
    operand = (
        D * 4 * H + H * 4 * H + 4 * H         # w/u/b
        + 2 * (2 * B * D + 4 * B * H)         # double-buffered streams
    )
    f32 = (
        2 * (D * 4 * H + H * 4 * H + 4 * H)   # grad scratch + pinned
        + 10 * B * H + 2 * B * 4 * H          # temps + carries
    )
    # verified to compile at reference scale (D=H=256) on v5e (16 MB/core)
    return operand * itemsize + f32 * 4 < 15_500_000


def _lstm_x_use_pallas(x, h0, activation, interpret) -> bool:
    if activation != "tanh":  # bwd kernels hardcode the tanh derivative
        return False
    if interpret:
        return True
    return (
        jax.default_backend() == "tpu"
        and activation == "tanh"
        and _lstm_x_train_vmem_ok(
            x.shape[1], x.shape[2], h0.shape[-1], x.dtype.itemsize
        )
    )


def _lstm_layer_fallback_x(x, h0, c0, w, b, u, activation,
                           return_sequences, interpret):
    T, B, D = x.shape
    xp = (x.reshape(T * B, D) @ w + b).reshape(T, B, -1)
    return lstm_layer_train(
        xp, h0, c0, u, activation, return_sequences, interpret
    )


def _lstm_layer_reference_x(x, h0, c0, w, b, u, act, return_sequences):
    T, B, D = x.shape
    xp = (x.reshape(T * B, D) @ w + b).reshape(T, B, -1)
    return _lstm_scan_reference(xp, h0, c0, u, act, return_sequences)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def lstm_layer_train_x(
    x, h0, c0, w, b, u, activation: str = "tanh",
    return_sequences: bool = False, interpret: bool = False,
):
    """LSTM layer with IN-KERNEL x-projection: fused fwd AND fused bwd."""
    if not _lstm_x_use_pallas(x, h0, activation, interpret):
        return _lstm_layer_fallback_x(
            x, h0, c0, w, b, u, activation, return_sequences, interpret
        )
    h_seq, _ = _lstm_fwdx_pallas(x, h0, c0, w, b, u, activation, interpret)
    return h_seq if return_sequences else h_seq[-1]


def _llx_fwd(x, h0, c0, w, b, u, activation, return_sequences, interpret):
    if not _lstm_x_use_pallas(x, h0, activation, interpret):
        out, vjp = jax.vjp(
            lambda a, b_, c, d, e, f: _lstm_layer_fallback_x(
                a, b_, c, d, e, f, activation, return_sequences, interpret
            ),
            x, h0, c0, w, b, u,
        )
        return out, (vjp,)
    h_seq, c_seq = _lstm_fwdx_pallas(x, h0, c0, w, b, u, activation, interpret)
    out = h_seq if return_sequences else h_seq[-1]
    return out, (x, h0, c0, w, b, u, h_seq, c_seq)


def _llx_bwd(activation, return_sequences, interpret, residuals, g):
    if len(residuals) == 1:
        (vjp,) = residuals
        return vjp(g)
    x, h0, c0, w, b, u, h_seq, c_seq = residuals
    if return_sequences:
        d_seq = g
        d_final = jnp.zeros_like(h0)
    else:
        d_seq = jnp.zeros_like(h_seq[:1])
        d_final = g
    dx, dh0, dc0, dw, db, du = _lstm_bwdx_pallas(
        x, h_seq, c_seq, h0, c0, d_seq, d_final, w, b, u,
        return_sequences, interpret,
    )
    return (dx, dh0, dc0, dw.astype(w.dtype), db[0].astype(b.dtype),
            du.astype(u.dtype))


lstm_layer_train_x.defvjp(_llx_fwd, _llx_bwd)


# ===========================================================================
# 2-layer GRU ENCODER STACK in one kernel (fwd + bwd), in-kernel projections.
#
# The reference encoder is exactly GRU(seq=True) -> GRU(final)
# (vae_definition.py:455-461). Fusing both layers into one kernel halves the
# launch count and keeps layer 1's output in VMEM for layer 2 at each step.
# MEASURED: a wash vs two gru_layer_train_x calls (3.93M vs 3.99M
# note-steps/s end-to-end, interleaved A/B on v5e) -- per-kernel launch
# overhead inside one XLA program is negligible and the HBM saving is offset
# by the larger kernel's weaker pipelining. The model therefore keeps the
# simpler per-layer dispatch; this op stays available and tested.
# ===========================================================================

def _stack2_fwd_kernel(
    x_ref, h01_ref, h02_ref, w1_ref, b1_ref, u1_ref, w2_ref, b2_ref, u2_ref,
    h1seq_ref, h2seq_ref, h1_s, h2_s, *, act,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h1_s[:] = h01_ref[:]
        h2_s[:] = h02_ref[:]

    H = h1_s.shape[-1]

    def gru(xp, h, u):
        hu = _dot(h, u[:, : 2 * H])
        z = jax.nn.sigmoid(xp[:, :H] + hu[:, :H])
        r = jax.nn.sigmoid(xp[:, H : 2 * H] + hu[:, H:])
        hh = act(xp[:, 2 * H :] + _dot(r * h, u[:, 2 * H :]))
        return z * h + (1.0 - z) * hh

    h1 = gru(
        _dot(x_ref[0], w1_ref[:]) + b1_ref[:].astype(jnp.float32),
        h1_s[:], u1_ref[:],
    )
    h2 = gru(
        _dot(h1, w2_ref[:]) + b2_ref[:].astype(jnp.float32),
        h2_s[:], u2_ref[:],
    )
    h1_s[:] = h1.astype(h1_s.dtype)
    h2_s[:] = h2.astype(h2_s.dtype)
    h1seq_ref[0] = h1.astype(h1seq_ref.dtype)
    h2seq_ref[0] = h2.astype(h2seq_ref.dtype)


def _stack2_fwd_pallas(x, h01, h02, p1, p2, activation, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    p1 = dict(p1, b=p1["b"].astype(jnp.float32))  # see _fwdx_pallas
    p2 = dict(p2, b=p2["b"].astype(jnp.float32))
    T, B, D = x.shape
    H = h01.shape[-1]
    seq = lambda d: pl.BlockSpec((1, B, d), lambda t: (t, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stack2_fwd_kernel, act=act),
        grid=(T,),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
        ),
        in_specs=[seq(D)] + [vm] * 8,
        out_specs=(seq(H), seq(H)),
        scratch_shapes=[
            pltpu.VMEM((B, H), x.dtype),
            pltpu.VMEM((B, H), x.dtype),
        ],
        interpret=interpret,
    )(x, h01, h02, p1["w"], p1["b"], p1["u"], p2["w"], p2["b"], p2["u"])


def _stack2_bwd_kernel(
    x_ref, h1_ref, h1p_ref, h2p_ref, dseq_ref, dfinal_ref,
    h01_ref, h02_ref,
    w1_ref, b1_ref, u1_ref, w2_ref, b2_ref, u2_ref,
    dx_ref, dh01_ref, dh02_ref,
    dw1_ref, db1_ref, du1_ref, dw2_ref, db2_ref, du2_ref,
    dh1_s, dh2_s,
    *, return_sequences,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)
    H = dh1_s.shape[-1]
    last = pl.num_programs(0) - 1

    @pl.when(step == 0)
    def _init():
        for ref in (dw1_ref, db1_ref, du1_ref, dw2_ref, db2_ref, du2_ref):
            ref[:] = jnp.zeros_like(ref)
        dh1_s[:] = jnp.zeros_like(dh1_s)
        if return_sequences:
            dh2_s[:] = jnp.zeros_like(dh2_s)
        else:
            dh2_s[:] = dfinal_ref[:].astype(dh2_s.dtype)

    dh2 = dh2_s[:].astype(jnp.float32)
    if return_sequences:
        dh2 = dh2 + dseq_ref[0].astype(jnp.float32)

    is_first_t = step == last
    h1 = h1_ref[0]
    h2p = jnp.where(is_first_t, h02_ref[:], h2p_ref[0])
    dx2, dh2p, dW2, dU2, db2 = _gru_cell_bwd(
        h1, h2p, w2_ref[:], u2_ref[:], b2_ref[:], dh2
    )
    dw2_ref[:] += dW2
    du2_ref[:] += dU2
    db2_ref[:] += db2

    dh1 = dx2 + dh1_s[:].astype(jnp.float32)
    h1p = jnp.where(is_first_t, h01_ref[:], h1p_ref[0])
    dx1, dh1p, dW1, dU1, db1 = _gru_cell_bwd(
        x_ref[0], h1p, w1_ref[:], u1_ref[:], b1_ref[:], dh1
    )
    dw1_ref[:] += dW1
    du1_ref[:] += dU1
    db1_ref[:] += db1

    dx_ref[0] = dx1.astype(dx_ref.dtype)
    dh1_s[:] = dh1p
    dh2_s[:] = dh2p

    @pl.when(step == last)
    def _final():
        dh01_ref[:] = dh1p.astype(dh01_ref.dtype)
        dh02_ref[:] = dh2p.astype(dh02_ref.dtype)


def _stack2_bwd_pallas(x, h1_seq, h2_seq, h01, h02, d_seq, d_final, p1, p2,
                       return_sequences, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p1 = dict(p1, b=p1["b"].astype(jnp.float32))  # see _fwdx_pallas
    p2 = dict(p2, b=p2["b"].astype(jnp.float32))
    T, B, D = x.shape
    H = p1["u"].shape[0]
    f32 = jnp.float32
    rev = lambda t: (T - 1 - t, 0, 0)  # noqa: E731
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    mat = lambda s: pl.BlockSpec(s, lambda t: tuple(0 for _ in s),  # noqa: E731
                                 memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _stack2_bwd_kernel, return_sequences=return_sequences
        ),
        grid=(T,),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, D), x.dtype),        # dx
            jax.ShapeDtypeStruct((B, H), x.dtype),           # dh01
            jax.ShapeDtypeStruct((B, H), x.dtype),           # dh02
            # weight/bias grads in f32 (see _bwdx_pallas) -- cast in _gs2_bwd
            jax.ShapeDtypeStruct((D, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, B, D), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),  # h1_t
            _hprev_spec(T, B, H),                                   # h1_{t-1}
            _hprev_spec(T, B, H),                                   # h2_{t-1}
            pl.BlockSpec(
                (1, B, H),
                rev if return_sequences else (lambda t: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            vm, vm, vm, vm, vm, vm, vm, vm, vm,
        ],
        out_specs=(
            pl.BlockSpec((1, B, D), rev, memory_space=pltpu.VMEM),
            mat((B, H)), mat((B, H)),
            mat((D, 3 * H)), mat((1, 3 * H)), mat((H, 3 * H)),
            mat((H, 3 * H)), mat((1, 3 * H)), mat((H, 3 * H)),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), f32), pltpu.VMEM((B, H), f32),
        ],
        interpret=interpret,
    )(x, h1_seq, h1_seq, h2_seq, d_seq, d_final, h01, h02,
      p1["w"], p1["b"], p1["u"], p2["w"], p2["b"], p2["u"])


def _stack2_vmem_ok(B: int, D: int, H: int) -> bool:
    weights = D * 3 * H + 2 * H * 3 * H + H * 3 * H + 2 * 3 * H
    grads = 2 * weights
    streams = 2 * (2 * B * D + 4 * B * H)
    temps = 8 * B * 3 * H // 2 + 2 * B * H
    return (weights + grads + streams + temps) * 4 < 15_500_000


def _stack2_use_pallas(x, h01, activation, interpret) -> bool:
    if activation != "tanh":  # bwd kernels hardcode the tanh derivative
        return False
    if interpret:
        return True
    return (
        jax.default_backend() == "tpu"
        and activation == "tanh"
        # degenerate-K bf16 projections are handled in the per-layer
        # kernels, not here; the stack op is only used for wide inputs
        and (x.dtype == jnp.float32 or x.shape[2] >= 8)
        and _stack2_vmem_ok(x.shape[1], x.shape[2], h01.shape[-1])
    )


def _stack2_reference(x, h01, h02, p1, p2, act, return_sequences):
    out1 = _gru_layer_reference_x(x, h01, p1["w"], p1["b"], p1["u"], act, True)
    return _gru_layer_reference_x(
        out1, h02, p2["w"], p2["b"], p2["u"], act, return_sequences
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gru_stack2_train_x(
    x, h01, h02, p1, p2, activation: str = "tanh",
    return_sequences: bool = False, interpret: bool = False,
):
    """Two stacked GRU layers in ONE kernel each way (train path).

    x: (T, B, D); p1/p2: {'w','b','u'} per layer; returns layer 2's sequence
    (T, B, H) if return_sequences else its final h (B, H)."""
    act = _activation(activation)
    if not _stack2_use_pallas(x, h01, activation, interpret):
        return _stack2_reference(x, h01, h02, p1, p2, act, return_sequences)
    h1_seq, h2_seq = _stack2_fwd_pallas(x, h01, h02, p1, p2, activation,
                                        interpret)
    return h2_seq if return_sequences else h2_seq[-1]


def _gs2_fwd(x, h01, h02, p1, p2, activation, return_sequences, interpret):
    act = _activation(activation)
    if not _stack2_use_pallas(x, h01, activation, interpret):
        out, vjp = jax.vjp(
            lambda a, b, c, d, e: _stack2_reference(
                a, b, c, d, e, act, return_sequences
            ),
            x, h01, h02, p1, p2,
        )
        return out, (vjp,)
    h1_seq, h2_seq = _stack2_fwd_pallas(x, h01, h02, p1, p2, activation,
                                        interpret)
    out = h2_seq if return_sequences else h2_seq[-1]
    return out, (x, h01, h02, p1, p2, h1_seq, h2_seq)


def _gs2_bwd(activation, return_sequences, interpret, residuals, g):
    if len(residuals) == 1:
        (vjp,) = residuals
        return vjp(g)
    x, h01, h02, p1, p2, h1_seq, h2_seq = residuals
    if return_sequences:
        d_seq = g
        d_final = jnp.zeros_like(h02)
    else:
        d_seq = jnp.zeros_like(h2_seq[:1])
        d_final = g
    (dx, dh01, dh02, dw1, db1, du1, dw2, db2, du2) = _stack2_bwd_pallas(
        x, h1_seq, h2_seq, h01, h02, d_seq, d_final, p1, p2,
        return_sequences, interpret,
    )
    dp1 = {"w": dw1, "b": db1[0], "u": du1}
    dp2 = {"w": dw2, "b": db2[0], "u": du2}
    dp1 = jax.tree_util.tree_map(lambda g, p: g.astype(p.dtype), dp1, dict(p1))
    dp2 = jax.tree_util.tree_map(lambda g, p: g.astype(p.dtype), dp2, dict(p2))
    return dx, dh01, dh02, dp1, dp2


gru_stack2_train_x.defvjp(_gs2_fwd, _gs2_bwd)


# ===========================================================================
# INFERENCE variants of the in-kernel x-projection layer kernels.
#
# The whole-scan inference path (ops/fused_decoder.fused_encoder_scan /
# ops/fused_lstm.fused_lstm_encoder_scan) streams a PRECOMPUTED xp
# (T, B, gates): at reference scale that materializes ~50 MB per layer in
# HBM plus a (B,T,gates)->(T,B,gates) transpose copy -- measured ~0.2 ms/
# step of pure copies in the device-epoch history pass. These variants are
# the inference twins of gru_layer_train_x / lstm_layer_train_x: W/b stay
# resident in VMEM, x@W happens per step in-kernel, and (for the common
# return_sequences=False encoder tail) only the FINAL h leaves the kernel.
# ===========================================================================

def _fwdx_last_kernel(x_ref, h0_ref, w_ref, b_ref, u_ref, out_ref, h_s,
                      *, act, cast_x=False):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h_s[:] = h0_ref[:]

    h = h_s[:]
    H = h.shape[-1]
    x = x_ref[0].astype(jnp.float32) if cast_x else x_ref[0]
    xp = _dot(x, w_ref[:]) + b_ref[:].astype(jnp.float32)
    hu_zr = _dot(h, u_ref[:, : 2 * H])
    z = jax.nn.sigmoid(xp[:, :H] + hu_zr[:, :H])
    r = jax.nn.sigmoid(xp[:, H : 2 * H] + hu_zr[:, H:])
    hh = act(xp[:, 2 * H :] + _dot(r * h, u_ref[:, 2 * H :]))
    new_h = z * h + (1.0 - z) * hh
    h_s[:] = new_h.astype(h_s.dtype)

    @pl.when(step == pl.num_programs(0) - 1)
    def _final():
        out_ref[:] = new_h.astype(out_ref.dtype)


def _fwdx_last_pallas(x, h0, w, b, u, activation, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    b = b.astype(jnp.float32)  # see _fwdx_pallas
    T, B, D = x.shape
    cast_x = D < 8 and x.dtype != jnp.float32
    if cast_x:
        w = w.astype(jnp.float32)
    H = h0.shape[-1]
    return pl.pallas_call(
        functools.partial(_fwdx_last_kernel, act=act, cast_x=cast_x),
        grid=(T,),
        out_shape=jax.ShapeDtypeStruct((B, H), x.dtype),
        in_specs=[
            pl.BlockSpec((1, B, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, H), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, H), x.dtype)],
        interpret=interpret,
    )(x, h0, w, b, u)


def gru_layer_infer_x(
    x, h0, w, b, u, activation: str = "tanh", return_sequences: bool = False,
    interpret: bool = False,
):
    """Inference GRU layer with in-kernel x-projection (no xp in HBM).

    Same contract as gru_layer_train_x but NOT differentiable through a
    fused backward (inference paths only; autodiff falls back to the jnp
    scan via the fallback branch)."""
    if not _x_use_pallas(x, h0, activation, interpret):
        act = _activation(activation)
        return _gru_layer_reference_x(x, h0, w, b, u, act, return_sequences)
    if return_sequences:
        return _fwdx_pallas(x, h0, w, b, u, activation, interpret)
    return _fwdx_last_pallas(x, h0, w, b, u, activation, interpret)


def _lstm_fwdx_last_kernel(x_ref, h0_ref, c0_ref, w_ref, b_ref, u_ref,
                           out_ref, h_s, c_s, *, act, cast_x=False):
    import jax.experimental.pallas as pl

    from .fused_lstm import _lstm_gates

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    x = x_ref[0].astype(jnp.float32) if cast_x else x_ref[0]
    xp = _dot(x, w_ref[:]) + b_ref[:].astype(jnp.float32)
    new_h, new_c = _lstm_gates(xp, h_s[:], c_s[:], u_ref[:], act)
    h_s[:] = new_h.astype(h_s.dtype)
    c_s[:] = new_c.astype(c_s.dtype)

    @pl.when(step == pl.num_programs(0) - 1)
    def _final():
        out_ref[:] = new_h.astype(out_ref.dtype)


def _lstm_fwdx_last_pallas(x, h0, c0, w, b, u, activation, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    b = b.astype(jnp.float32)  # see _fwdx_pallas
    T, B, D = x.shape
    cast_x = D < 8 and x.dtype != jnp.float32
    if cast_x:
        w = w.astype(jnp.float32)
    H = h0.shape[-1]
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lstm_fwdx_last_kernel, act=act, cast_x=cast_x),
        grid=(T,),
        out_shape=jax.ShapeDtypeStruct((B, H), x.dtype),
        in_specs=[
            pl.BlockSpec((1, B, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            vm, vm, vm, vm, vm,
        ],
        out_specs=pl.BlockSpec((B, H), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, H), x.dtype),
            pltpu.VMEM((B, H), x.dtype),
        ],
        interpret=interpret,
    )(x, h0, c0, w, b, u)


def lstm_layer_infer_x(
    x, h0, c0, w, b, u, activation: str = "tanh",
    return_sequences: bool = False, interpret: bool = False,
):
    """Inference LSTM layer with in-kernel x-projection (no xp in HBM)."""
    if not _lstm_x_use_pallas(x, h0, activation, interpret):
        act = _activation(activation)
        return _lstm_layer_reference_x(
            x, h0, c0, w, b, u, act, return_sequences
        )
    if return_sequences:
        h_seq, _ = _lstm_fwdx_pallas(x, h0, c0, w, b, u, activation,
                                     interpret)
        return h_seq
    return _lstm_fwdx_last_pallas(x, h0, c0, w, b, u, activation, interpret)


# ===========================================================================
# MULTI-HEAD decode train kernels: ONE kernel pair runs the 2-layer primary
# head (notes) AND every 1-layer T-length head (velocity, held) together.
#
# The heads are independent readout decoders over the same T (they share no
# state, vae_definition.py:519-683), but as separate kernels they serialize
# on the single TensorCore and each pays the full per-step latency of its
# serial cell chain. Inside one kernel the narrow heads' per-step work
# issues back-to-back with the primary head's -- device-side tracing showed
# the separate velocity kernel pair costing ~0.24 ms/step that this fusion
# mostly hides.
#
# Grads accumulate directly in pinned f32 output refs and step-(t-1) values
# come from the forward sequences via shifted index maps, as in the
# single-head kernels above.
# ===========================================================================

def _mh_out_act(logits, name):
    if name == "softmax":
        return jax.nn.softmax(logits, axis=-1)
    if name == "sigmoid":
        return jax.nn.sigmoid(logits)
    return logits


def _mh_fwd_kernel(*refs, n_heads, act, out_acts):
    import jax.experimental.pallas as pl

    from .fused_decoder import _gru_gates

    K = n_heads
    # inputs: start_p, i1, i2, w1,u1,b1, w2,u2,b2, wo,bo,
    #         then per head: start_k, ik, wk,uk,bk, wok,bok       (7 each)
    n_in = 11 + 7 * K
    # outputs: probs_p, logits_p, h1seq, h2seq,
    #          then per head: probs_k, logits_k, hkseq            (3 each)
    n_out = 4 + 3 * K
    ins, outs, scr = refs[:n_in], refs[n_in:n_in + n_out], refs[n_in + n_out:]
    (start_p, i1, i2, w1, u1, b1, w2, u2, b2, wo, bo) = ins[:11]
    probs_p_ref, logits_p_ref, h1seq_ref, h2seq_ref = outs[:4]
    h1_s, h2_s, xp_s = scr[:3]  # then per head (hk_s, xk_s)

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h1_s[:] = i1[:]
        h2_s[:] = i2[:]
        xp_s[:] = start_p[:]
        for k in range(K):
            scr[3 + 2 * k][:] = ins[11 + 7 * k + 1][:]   # hk_s = ik
            scr[3 + 2 * k + 1][:] = ins[11 + 7 * k][:]   # xk_s = start_k

    h1 = _gru_gates(xp_s[:], h1_s[:], w1[:], u1[:], b1[:], act)
    h2 = _gru_gates(h1, h2_s[:], w2[:], u2[:], b2[:], act)
    logits = jnp.dot(h2, wo[:], preferred_element_type=jnp.float32) + bo[:]
    probs = _mh_out_act(logits, out_acts[0])
    probs_p_ref[0] = probs.astype(probs_p_ref.dtype)
    logits_p_ref[0] = logits.astype(logits_p_ref.dtype)
    h1seq_ref[0] = h1.astype(h1seq_ref.dtype)
    h2seq_ref[0] = h2.astype(h2seq_ref.dtype)
    h1_s[:] = h1.astype(h1_s.dtype)
    h2_s[:] = h2.astype(h2_s.dtype)
    xp_s[:] = probs.astype(xp_s.dtype)

    for k in range(K):
        wk, uk, bk, wok, bok = ins[11 + 7 * k + 2 : 11 + 7 * k + 7]
        hk_s, xk_s = scr[3 + 2 * k], scr[3 + 2 * k + 1]
        probs_k_ref, logits_k_ref, hkseq_ref = outs[4 + 3 * k : 7 + 3 * k]
        hk = _gru_gates(xk_s[:], hk_s[:], wk[:], uk[:], bk[:], act)
        logits_k = (
            jnp.dot(hk, wok[:], preferred_element_type=jnp.float32) + bok[:]
        )
        probs_k = _mh_out_act(logits_k, out_acts[1 + k])
        probs_k_ref[0] = probs_k.astype(probs_k_ref.dtype)
        logits_k_ref[0] = logits_k.astype(logits_k_ref.dtype)
        hkseq_ref[0] = hk.astype(hkseq_ref.dtype)
        hk_s[:] = hk.astype(hk_s.dtype)
        xk_s[:] = probs_k.astype(xk_s.dtype)


def _mh_bwd_kernel(*refs, n_heads, out_acts):
    import jax.experimental.pallas as pl

    K = n_heads
    # inputs: xprev_p, h1, h1p, h2, h2p, probs_p, gp_p, gl_p,
    #         start_p, i1, i2, w1,u1,b1, w2,u2,b2, wo,              (18)
    #   per head: xprev_k, probs_k, hk, hkp, gp_k, gl_k,
    #             start_k, ik, wk,uk,bk, wok                        (12 each)
    n_in = 18 + 12 * K
    # outputs: dw1,du1,db1, dw2,du2,db2, dwo,dbo, di1,di2, dstart_p (11)
    #   per head: dwk,duk,dbk, dwok,dbok, dik, dstart_k             (7 each)
    n_out = 11 + 7 * K
    ins, outs, scr = refs[:n_in], refs[n_in:n_in + n_out], refs[n_in + n_out:]
    (xprev_p, h1_ref, h1p_ref, h2_ref, h2p_ref, probs_p_ref, gp_p, gl_p,
     start_p, i1, i2, w1, u1, b1, w2, u2, b2, wo) = ins[:18]
    (dw1_ref, du1_ref, db1_ref, dw2_ref, du2_ref, db2_ref,
     dwo_ref, dbo_ref, di1_ref, di2_ref, dstart_p_ref) = outs[:11]
    dh1_s, dh2_s, dxp_s = scr[:3]  # then per head (dhk_s, dxk_s)

    step = pl.program_id(0)
    last = pl.num_programs(0) - 1
    is_first_t = step == last

    @pl.when(step == 0)
    def _init():
        for s in scr:
            s[:] = jnp.zeros_like(s)
        for o in outs[:8]:
            o[:] = jnp.zeros_like(o)
        for k in range(K):
            for o in outs[11 + 7 * k : 11 + 7 * k + 5]:
                o[:] = jnp.zeros_like(o)

    # primary (2-layer) head
    probs = probs_p_ref[0].astype(jnp.float32)
    gp_total = gp_p[0].astype(jnp.float32) + dxp_s[:]
    dlog = _dlogits_from(probs, gp_total, gl_p[0].astype(jnp.float32),
                         out_acts[0])
    h2 = h2_ref[0]
    dwo_ref[:] += _outer_acc(h2.astype(jnp.float32), dlog)
    dbo_ref[:] += jnp.sum(dlog, axis=0, keepdims=True)
    dh2 = _dot_t(dlog, wo[:]) + dh2_s[:]
    h1 = h1_ref[0]
    h2p = jnp.where(is_first_t, i2[:], h2p_ref[0].astype(i2.dtype))
    dx2, dh2p, dW2, dU2, db2 = _gru_cell_bwd(h1, h2p, w2[:], u2[:], b2[:], dh2)
    dw2_ref[:] += dW2
    du2_ref[:] += dU2
    db2_ref[:] += db2
    dh1 = dx2 + dh1_s[:]
    x = jnp.where(is_first_t, start_p[:], xprev_p[0])
    h1p = jnp.where(is_first_t, i1[:], h1p_ref[0].astype(i1.dtype))
    dx1, dh1p, dW1, dU1, db1 = _gru_cell_bwd(x, h1p, w1[:], u1[:], b1[:], dh1)
    dw1_ref[:] += dW1
    du1_ref[:] += dU1
    db1_ref[:] += db1
    dh1_s[:] = dh1p
    dh2_s[:] = dh2p
    dxp_s[:] = dx1

    @pl.when(step == last)
    def _final_p():
        di1_ref[:] = dh1p.astype(di1_ref.dtype)
        di2_ref[:] = dh2p.astype(di2_ref.dtype)
        dstart_p_ref[:] = dx1.astype(dstart_p_ref.dtype)

    # 1-layer side heads (independent pipelines)
    for k in range(K):
        (xprev_k, probs_k_ref, hk_ref, hkp_ref, gp_k, gl_k,
         start_k, ik, wk, uk, bk, wok) = ins[18 + 12 * k : 18 + 12 * (k + 1)]
        (dwk_ref, duk_ref, dbk_ref, dwok_ref, dbok_ref,
         dik_ref, dstart_k_ref) = outs[11 + 7 * k : 11 + 7 * (k + 1)]
        dhk_s, dxk_s = scr[3 + 2 * k], scr[3 + 2 * k + 1]

        probs_k = probs_k_ref[0].astype(jnp.float32)
        gp_k_total = gp_k[0].astype(jnp.float32) + dxk_s[:]
        dlog_k = _dlogits_from(probs_k, gp_k_total,
                               gl_k[0].astype(jnp.float32), out_acts[1 + k])
        hk = hk_ref[0]
        dwok_ref[:] += _outer_acc(hk.astype(jnp.float32), dlog_k)
        dbok_ref[:] += jnp.sum(dlog_k, axis=0, keepdims=True)
        dhk = _dot_t(dlog_k, wok[:]) + dhk_s[:]
        xk = jnp.where(is_first_t, start_k[:], xprev_k[0])
        hkp = jnp.where(is_first_t, ik[:], hkp_ref[0].astype(ik.dtype))
        dxk, dhkp, dWk, dUk, dbk = _gru_cell_bwd(
            xk, hkp, wk[:], uk[:], bk[:], dhk
        )
        dwk_ref[:] += dWk
        duk_ref[:] += dUk
        dbk_ref[:] += dbk
        dhk_s[:] = dhkp
        dxk_s[:] = dxk

        @pl.when(step == last)
        def _final_k(dik_ref=dik_ref, dstart_k_ref=dstart_k_ref,
                     dhkp=dhkp, dxk=dxk):
            dik_ref[:] = dhkp.astype(dik_ref.dtype)
            dstart_k_ref[:] = dxk.astype(dstart_k_ref.dtype)


def _mh_specs(T, B, dims, H):
    """(in_specs, out helper lambdas) shared by the wrappers."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rev = lambda t: (T - 1 - t, 0, 0)  # noqa: E731
    fwdmap = lambda t: (t, 0, 0)  # noqa: E731
    seq = lambda d, m: pl.BlockSpec((1, B, d), m, memory_space=pltpu.VMEM)  # noqa: E731
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    mat = lambda s: pl.BlockSpec(s, lambda t: tuple(0 for _ in s),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    prev = lambda d: pl.BlockSpec(  # noqa: E731
        (1, B, d), lambda s: (jnp.maximum(T - 2 - s, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return rev, fwdmap, seq, vm, mat, prev


def multihead_decode_train_fwd(primary, heads, T, activation, out_acts,
                               interpret, residual_dtype=None):
    """Forward for the fused multi-head decode.

    primary: dict(cells=[c1, c2], out=dense, init=[i1, i2], start=(B, Dp),
    out_activation=str); heads: list of dicts with 1-element cells/init.
    Returns (probs_p, logits_p, h1seq, h2seq, [probs_k, logits_k, hkseq]*K),
    every sequence time-major. residual_dtype narrows ONLY the h-seq
    residual streams (see gru_decode_multihead_train)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    K = len(heads)
    B, Dp = primary["start"].shape
    H = primary["init"][0].shape[-1]
    dims = [Dp] + [h["start"].shape[-1] for h in heads]
    dt = primary["start"].dtype
    rev, fwdmap, seq, vm, mat, prev = _mh_specs(T, B, dims, H)

    inputs = [
        primary["start"], primary["init"][0], primary["init"][1],
        primary["cells"][0]["w"], primary["cells"][0]["u"],
        primary["cells"][0]["b"],
        primary["cells"][1]["w"], primary["cells"][1]["u"],
        primary["cells"][1]["b"],
        primary["out"]["w"], primary["out"]["b"],
    ]
    rdt = residual_dtype or dt
    out_shape = [
        jax.ShapeDtypeStruct((T, B, Dp), dt),
        jax.ShapeDtypeStruct((T, B, Dp), dt),
        jax.ShapeDtypeStruct((T, B, H), rdt),
        jax.ShapeDtypeStruct((T, B, H), rdt),
    ]
    out_specs = [seq(Dp, fwdmap), seq(Dp, fwdmap), seq(H, fwdmap),
                 seq(H, fwdmap)]
    scratch = [pltpu.VMEM((B, H), dt), pltpu.VMEM((B, H), dt),
               pltpu.VMEM((B, Dp), dt)]
    for k, h in enumerate(heads):
        Dk = dims[1 + k]
        inputs += [
            h["start"], h["init"][0],
            h["cells"][0]["w"], h["cells"][0]["u"], h["cells"][0]["b"],
            h["out"]["w"], h["out"]["b"],
        ]
        out_shape += [
            jax.ShapeDtypeStruct((T, B, Dk), dt),
            jax.ShapeDtypeStruct((T, B, Dk), dt),
            jax.ShapeDtypeStruct((T, B, H), rdt),
        ]
        out_specs += [seq(Dk, fwdmap), seq(Dk, fwdmap), seq(H, fwdmap)]
        scratch += [pltpu.VMEM((B, H), dt), pltpu.VMEM((B, Dk), dt)]

    return pl.pallas_call(
        functools.partial(_mh_fwd_kernel, n_heads=K, act=act,
                          out_acts=tuple(out_acts)),
        grid=(T,),
        out_shape=tuple(out_shape),
        in_specs=[vm] * len(inputs),
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_MH_VMEM_LIMIT_BYTES
        ),
    )(*inputs)


def multihead_decode_train_bwd(primary, heads, fwd_outs, gs, T, out_acts,
                               interpret):
    """Backward: gs = list of (g_probs, g_logits) per head (primary first)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = len(heads)
    B, Dp = primary["start"].shape
    H = primary["init"][0].shape[-1]
    dims = [Dp] + [h["start"].shape[-1] for h in heads]
    dt = primary["start"].dtype
    f32 = jnp.float32
    rev, fwdmap, seq, vm, mat, prev = _mh_specs(T, B, dims, H)

    probs_p, _logits_p, h1seq, h2seq = fwd_outs[:4]
    inputs = [
        probs_p, h1seq, h1seq, h2seq, h2seq, probs_p, gs[0][0], gs[0][1],
        primary["start"], primary["init"][0], primary["init"][1],
        primary["cells"][0]["w"], primary["cells"][0]["u"],
        primary["cells"][0]["b"],
        primary["cells"][1]["w"], primary["cells"][1]["u"],
        primary["cells"][1]["b"],
        primary["out"]["w"],
    ]
    in_specs = [prev(Dp), seq(H, rev), prev(H), seq(H, rev), prev(H),
                seq(Dp, rev), seq(Dp, rev), seq(Dp, rev)] + [vm] * 10
    out_shape = [
        jax.ShapeDtypeStruct((Dp, 3 * H), f32),
        jax.ShapeDtypeStruct((H, 3 * H), f32),
        jax.ShapeDtypeStruct((1, 3 * H), f32),
        jax.ShapeDtypeStruct((H, 3 * H), f32),
        jax.ShapeDtypeStruct((H, 3 * H), f32),
        jax.ShapeDtypeStruct((1, 3 * H), f32),
        jax.ShapeDtypeStruct((H, Dp), f32),
        jax.ShapeDtypeStruct((1, Dp), f32),
        jax.ShapeDtypeStruct((B, H), dt),
        jax.ShapeDtypeStruct((B, H), dt),
        jax.ShapeDtypeStruct((B, Dp), dt),
    ]
    out_specs = [
        mat((Dp, 3 * H)), mat((H, 3 * H)), mat((1, 3 * H)),
        mat((H, 3 * H)), mat((H, 3 * H)), mat((1, 3 * H)),
        mat((H, Dp)), mat((1, Dp)),
        mat((B, H)), mat((B, H)), mat((B, Dp)),
    ]
    scratch = [pltpu.VMEM((B, H), f32), pltpu.VMEM((B, H), f32),
               pltpu.VMEM((B, Dp), f32)]
    for k, h in enumerate(heads):
        Dk = dims[1 + k]
        probs_k, _lk, hkseq = fwd_outs[4 + 3 * k : 7 + 3 * k]
        inputs += [
            probs_k, probs_k, hkseq, hkseq, gs[1 + k][0], gs[1 + k][1],
            h["start"], h["init"][0],
            h["cells"][0]["w"], h["cells"][0]["u"], h["cells"][0]["b"],
            h["out"]["w"],
        ]
        in_specs += [prev(Dk), seq(Dk, rev), seq(H, rev), prev(H),
                     seq(Dk, rev), seq(Dk, rev)] + [vm] * 6
        out_shape += [
            jax.ShapeDtypeStruct((Dk, 3 * H), f32),
            jax.ShapeDtypeStruct((H, 3 * H), f32),
            jax.ShapeDtypeStruct((1, 3 * H), f32),
            jax.ShapeDtypeStruct((H, Dk), f32),
            jax.ShapeDtypeStruct((1, Dk), f32),
            jax.ShapeDtypeStruct((B, H), dt),
            jax.ShapeDtypeStruct((B, Dk), dt),
        ]
        out_specs += [
            mat((Dk, 3 * H)), mat((H, 3 * H)), mat((1, 3 * H)),
            mat((H, Dk)), mat((1, Dk)),
            mat((B, H)), mat((B, Dk)),
        ]
        scratch += [pltpu.VMEM((B, H), f32), pltpu.VMEM((B, Dk), f32)]

    return pl.pallas_call(
        functools.partial(_mh_bwd_kernel, n_heads=K,
                          out_acts=tuple(out_acts)),
        grid=(T,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_MH_VMEM_LIMIT_BYTES
        ),
    )(*inputs)


# the multi-head bwd with BOTH narrow heads (B=256, Dp=61, dks=[1,2], H=256)
# measures a 16.43 MB Mosaic scoped stack -- over XLA's default 16 MB
# guardrail (the AOT/tunnel compiler rejects it; a cached binary of the
# identical kernel trains correctly at full speed for 300+ epochs on v5e,
# whose physical VMEM is far larger). Raise the per-kernel cap so the
# compile is deterministic; _mh_vmem_ok still bounds admission.
_MH_VMEM_LIMIT_BYTES = 32 * 1024 * 1024



def _mh_vmem_ok(B, Dp, dks, H) -> bool:
    # weights + single f32 grad copies (accumulated in the pinned outputs)
    # + double-buffered per-step stream blocks + shared gate temporaries
    # (Mosaic reuses the temp registers across the sequentially-issued
    # heads) + f32 carries. VERIFIED to compile and run at reference scale
    # with BOTH narrow heads (B=256, Dp=61, dks=[1,2], H=256) on v5e.
    def head_w(d):
        return d * 3 * H + H * 3 * H + 3 * H + H * d + d
    weights = head_w(Dp) + H * 3 * H + 3 * H  # primary has 2 cells
    streams = 8 * B * Dp + 8 * B * H
    carries = 2 * B * H + B * Dp
    for d in dks:
        weights += head_w(d)
        streams += 8 * B * max(d, 128) + 4 * B * H  # lane padding for narrow
        carries += B * H + B * max(d, 128)
    temps = 4 * B * 3 * H + 2 * B * H
    total = (2 * weights + streams + temps + carries) * 4
    # the estimate overcounts (Mosaic drops to single-buffering under
    # pressure): the dks=[1,2] reference config computes 18.7 MB here,
    # measures 16.43 MB in Mosaic, and compiles + runs on v5e under the
    # raised _MH_VMEM_LIMIT_BYTES kernel cap
    return total < 19_000_000


def _mh_use_pallas(primary, heads, activation, out_acts, interpret) -> bool:
    # semantic constraints hold in interpret mode too
    if activation != "tanh" or not all(
        a in ("softmax", "sigmoid", "linear") for a in out_acts
    ):
        return False
    if interpret:
        return True
    B, Dp = primary["start"].shape
    H = primary["init"][0].shape[-1]
    return (
        jax.default_backend() == "tpu"
        and activation == "tanh"
        # f32 only: the narrow side heads (velocity D=1) hit Mosaic's
        # mixed-type broadcast on the degenerate-K projection under bf16
        # ('vector.broadcast' verification error); bf16 training falls back
        # to the per-head kernels, which carry the f32-cast workaround
        and primary["start"].dtype == jnp.float32
        and all(a in ("softmax", "sigmoid", "linear") for a in out_acts)
        and _mh_vmem_ok(B, Dp, [h["start"].shape[-1] for h in heads], H)
    )


def _mh_reference(primary, heads, T, activation, out_acts):
    act = _activation(activation)
    outs = []
    for spec, oa in zip([primary] + list(heads), out_acts):
        p, l = _decode_scan_reference(
            spec["cells"], spec["out"], list(spec["init"]), spec["start"],
            T, act, _out_act_fn(oa),
        )
        outs.append((p, l))
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def gru_decode_multihead_train(
    primary, heads, T: int, activation: str, out_acts: tuple,
    interpret: bool, residual_dtype=None,
):
    """Fused multi-head readout decode: 2-layer primary + K 1-layer heads.

    primary: {'cells': [c1, c2], 'out': dense, 'init': [i1, i2],
    'start': (B, Dp)}; heads: tuple of the same with 1-element cells/init;
    out_acts: one output-activation name per head, primary first. Returns a
    tuple of (probs, logits) per head, each (T, B, D) time-major. One Pallas
    kernel forward, one backward, for ALL heads together.

    residual_dtype (e.g. jnp.bfloat16) narrows ONLY the hidden-sequence
    residual streams the backward kernel reads (h1seq/h2seq/hkseq, at
    reference scale ~151 MB of the step's HBM traffic). The forward carry
    stays at model dtype in VMEM scratch, so probs/logits are BIT-EQUAL to
    residual_dtype=None; only the backward's gate recomputation reads
    rounded h values (~1e-3 rel gradient deviation). Measured perf-NEUTRAL
    at reference scale on v5e -- the kernels are serial-latency bound, not
    bandwidth bound (tools/bench_residual_dtype.py + profile_step device-op
    A/B; PARITY.md "measured dead ends")."""
    if not _mh_use_pallas(primary, heads, activation, out_acts, interpret):
        return _mh_reference(primary, heads, T, activation, out_acts)
    fwd_outs = multihead_decode_train_fwd(
        primary, list(heads), T, activation, out_acts, interpret,
        residual_dtype,
    )
    K = len(heads)
    result = [(fwd_outs[0], fwd_outs[1])]
    for k in range(K):
        result.append((fwd_outs[4 + 3 * k], fwd_outs[5 + 3 * k]))
    return tuple(result)


def _mh_fwd_rule(primary, heads, T, activation, out_acts, interpret,
                 residual_dtype=None):
    if not _mh_use_pallas(primary, heads, activation, out_acts, interpret):
        out, vjp = jax.vjp(
            lambda p, h: _mh_reference(p, h, T, activation, out_acts),
            primary, heads,
        )
        return out, (vjp,)
    fwd_outs = multihead_decode_train_fwd(
        primary, list(heads), T, activation, out_acts, interpret,
        residual_dtype,
    )
    K = len(heads)
    result = [(fwd_outs[0], fwd_outs[1])]
    for k in range(K):
        result.append((fwd_outs[4 + 3 * k], fwd_outs[5 + 3 * k]))
    return tuple(result), (primary, heads, fwd_outs)


def _mh_bwd_rule(T, activation, out_acts, interpret, residual_dtype,
                 residuals, g):
    if len(residuals) == 1:
        (vjp,) = residuals
        return vjp(g)
    primary, heads, fwd_outs = residuals
    K = len(heads)
    outs = multihead_decode_train_bwd(
        primary, list(heads), fwd_outs, list(g), T, out_acts, interpret
    )
    cast = lambda a, p: a.astype(p.dtype)  # noqa: E731
    (dw1, du1, db1, dw2, du2, db2, dwo, dbo, di1, di2, dstart) = outs[:11]
    d_primary = {
        "cells": [
            {"w": cast(dw1, primary["cells"][0]["w"]),
             "u": cast(du1, primary["cells"][0]["u"]),
             "b": cast(db1[0], primary["cells"][0]["b"])},
            {"w": cast(dw2, primary["cells"][1]["w"]),
             "u": cast(du2, primary["cells"][1]["u"]),
             "b": cast(db2[0], primary["cells"][1]["b"])},
        ],
        "out": {"w": cast(dwo, primary["out"]["w"]),
                "b": cast(dbo[0], primary["out"]["b"])},
        "init": [di1, di2],
        "start": dstart,
    }
    d_heads = []
    for k, h in enumerate(heads):
        (dwk, duk, dbk, dwok, dbok, dik, dsk) = outs[11 + 7 * k : 18 + 7 * k]
        d_heads.append({
            "cells": [{"w": cast(dwk, h["cells"][0]["w"]),
                       "u": cast(duk, h["cells"][0]["u"]),
                       "b": cast(dbk[0], h["cells"][0]["b"])}],
            "out": {"w": cast(dwok, h["out"]["w"]),
                    "b": cast(dbok[0], h["out"]["b"])},
            "init": [dik],
            "start": dsk,
        })
    return d_primary, tuple(d_heads)


gru_decode_multihead_train.defvjp(_mh_fwd_rule, _mh_bwd_rule)


# ===========================================================================
# MULTI-BRANCH encode train kernels: ONE kernel pair runs the 2-layer notes
# encoder stack AND every independent 1-layer meta-encoder branch
# (instrument / velocity / held) together.
#
# The reference encoder is GRU(seq)->GRU(final) over the notes input plus
# one single GRU per meta input, concatenated afterwards
# (vae_definition.py:443-484). The branches share nothing; fusing them into
# one kernel halves the launch count and merges their streams.
# MEASURED: a wash vs per-layer kernels (4.13M vs 4.14M note-steps/s
# end-to-end, interleaved A/B on v5e; device trace: 562 us fused bwd vs
# 567 us summed separate bwds) -- the encoder kernels are per-step
# COMPUTE-bound, so the branches' work serializes inside the fused kernel
# just as it does across separate kernels. The model keeps the simpler
# per-layer dispatch (same verdict as gru_stack2_train_x above); this op
# stays available and tested.
#
# Initial states are ZEROS by API contract (the model always zero-inits
# encoder states, models/cells.zero_states), so the kernels take no h0
# inputs and emit no dh0 grads. Branches may be SHORTER than the stack
# (instrument: T_k = max_voices = 4 vs T = 64): their per-step work is
# gated on the grid index and their stream index maps are clamped.
# ===========================================================================

def _encmb_gru(xp, h, u, act):
    H = h.shape[-1]
    hu = _dot(h, u[:, : 2 * H])
    z = jax.nn.sigmoid(xp[:, :H] + hu[:, :H])
    r = jax.nn.sigmoid(xp[:, H : 2 * H] + hu[:, H:])
    hh = act(xp[:, 2 * H :] + _dot(r * h, u[:, 2 * H :]))
    return z * h + (1.0 - z) * hh


def _encmb_fwd_kernel(*refs, n_branches, t_lens, act):
    import jax.experimental.pallas as pl

    K = n_branches
    # inputs: x, w1,b1,u1, w2,b2,u2, then per branch: xk, wk,bk,uk  (4 each)
    n_in = 7 + 4 * K
    # outputs: h1seq, h2seq, then per branch: hkseq
    n_out = 2 + K
    ins, outs, scr = refs[:n_in], refs[n_in:n_in + n_out], refs[n_in + n_out:]
    (x_ref, w1, b1, u1, w2, b2, u2) = ins[:7]
    h1seq_ref, h2seq_ref = outs[:2]
    h1_s, h2_s = scr[:2]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for s in scr:
            s[:] = jnp.zeros_like(s)

    h1 = _encmb_gru(
        _dot(x_ref[0], w1[:]) + b1[:].astype(jnp.float32), h1_s[:], u1[:], act
    )
    h2 = _encmb_gru(
        _dot(h1, w2[:]) + b2[:].astype(jnp.float32), h2_s[:], u2[:], act
    )
    h1_s[:] = h1.astype(h1_s.dtype)
    h2_s[:] = h2.astype(h2_s.dtype)
    h1seq_ref[0] = h1.astype(h1seq_ref.dtype)
    h2seq_ref[0] = h2.astype(h2seq_ref.dtype)

    for k in range(K):
        xk_ref, wk, bk, uk = ins[7 + 4 * k : 11 + 4 * k]
        hkseq_ref = outs[2 + k]
        hk_s = scr[2 + k]

        @pl.when(step < t_lens[k])
        def _branch(xk_ref=xk_ref, wk=wk, bk=bk, uk=uk,
                    hkseq_ref=hkseq_ref, hk_s=hk_s):
            hk = _encmb_gru(
                _dot(xk_ref[0], wk[:]) + bk[:].astype(jnp.float32),
                hk_s[:], uk[:], act,
            )
            hk_s[:] = hk.astype(hk_s.dtype)
            hkseq_ref[0] = hk.astype(hkseq_ref.dtype)


def _encmb_bwd_kernel(*refs, n_branches, t_lens, T):
    import jax.experimental.pallas as pl

    K = n_branches
    # inputs: x, h1 (at t), h1p, h2p, dfinal2, w1,b1,u1, w2,b2,u2,
    #         then per branch: xk, hkp, dfinal_k, wk,bk,uk           (6 each)
    n_in = 11 + 6 * K
    # outputs: dx, dw1,db1,du1, dw2,db2,du2,
    #          then per branch: dxk, dwk,dbk,duk                     (4 each)
    n_out = 7 + 4 * K
    ins, outs, scr = refs[:n_in], refs[n_in:n_in + n_out], refs[n_in + n_out:]
    (x_ref, h1_ref, h1p_ref, h2p_ref, dfinal2, w1, b1, u1, w2, b2, u2) = \
        ins[:11]
    (dx_ref, dw1_ref, db1_ref, du1_ref, dw2_ref, db2_ref, du2_ref) = outs[:7]
    dh1_s, dh2_s = scr[:2]

    step = pl.program_id(0)
    last = pl.num_programs(0) - 1
    is_first_t = step == last  # t == 0

    @pl.when(step == 0)
    def _init():
        for o in outs[1:7]:
            o[:] = jnp.zeros_like(o)
        for k in range(K):
            for o in outs[8 + 4 * k : 11 + 4 * k]:
                o[:] = jnp.zeros_like(o)
        dh1_s[:] = jnp.zeros_like(dh1_s)
        dh2_s[:] = dfinal2[:].astype(dh2_s.dtype)
        for s in scr[2:]:
            s[:] = jnp.zeros_like(s)

    h1 = h1_ref[0]
    zeros_h = jnp.zeros_like(dh2_s[:])
    h2p = jnp.where(is_first_t, zeros_h, h2p_ref[0].astype(jnp.float32))
    dx2, dh2p, dW2, dU2, db2 = _gru_cell_bwd(
        h1, h2p, w2[:], u2[:], b2[:], dh2_s[:]
    )
    dw2_ref[:] += dW2
    du2_ref[:] += dU2
    db2_ref[:] += db2

    dh1 = dx2 + dh1_s[:]
    h1p = jnp.where(is_first_t, zeros_h, h1p_ref[0].astype(jnp.float32))
    dx1, dh1p, dW1, dU1, db1 = _gru_cell_bwd(
        x_ref[0], h1p, w1[:], u1[:], b1[:], dh1
    )
    dw1_ref[:] += dW1
    du1_ref[:] += dU1
    db1_ref[:] += db1
    dx_ref[0] = dx1.astype(dx_ref.dtype)
    dh1_s[:] = dh1p
    dh2_s[:] = dh2p

    for k in range(K):
        xk_ref, hkp_ref, dfinal_k, wk, bk, uk = ins[11 + 6 * k : 17 + 6 * k]
        dxk_ref, dwk_ref, dbk_ref, duk_ref = outs[7 + 4 * k : 11 + 4 * k]
        dhk_s = scr[2 + k]
        Tk = t_lens[k]

        @pl.when(step == T - Tk)  # entering the branch's span: t == Tk - 1
        def _enter(dhk_s=dhk_s, dfinal_k=dfinal_k):
            dhk_s[:] = dfinal_k[:].astype(dhk_s.dtype)

        @pl.when(step >= T - Tk)
        def _branch(xk_ref=xk_ref, hkp_ref=hkp_ref, wk=wk, bk=bk, uk=uk,
                    dxk_ref=dxk_ref, dwk_ref=dwk_ref, dbk_ref=dbk_ref,
                    duk_ref=duk_ref, dhk_s=dhk_s):
            hp = jnp.where(
                is_first_t, zeros_h, hkp_ref[0].astype(jnp.float32)
            )
            dxk, dhkp, dWk, dUk, dbk = _gru_cell_bwd(
                xk_ref[0], hp, wk[:], uk[:], bk[:], dhk_s[:]
            )
            dwk_ref[:] += dWk
            duk_ref[:] += dUk
            dbk_ref[:] += dbk
            dxk_ref[0] = dxk.astype(dxk_ref.dtype)
            dhk_s[:] = dhkp


def _encmb_cast(x, p):
    """f32-promote a degenerate-K branch (D < 8, e.g. the 1-dim velocity
    input) -- see _fwdx_kernel's cast_x note."""
    if x.shape[-1] < 8 and x.dtype != jnp.float32:
        return x.astype(jnp.float32), dict(p, w=p["w"].astype(jnp.float32))
    return x, p


def encode_multibranch_train_fwd(stack, branches, activation, interpret):
    """Forward: returns (h1seq, h2seq, [hkseq]*K), all time-major."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    K = len(branches)
    x = stack["x"]
    T, B, D = x.shape
    H = stack["p1"]["u"].shape[0]
    dt = x.dtype
    p1 = dict(stack["p1"], b=stack["p1"]["b"].astype(jnp.float32))
    p2 = dict(stack["p2"], b=stack["p2"]["b"].astype(jnp.float32))

    seq = lambda d, m: pl.BlockSpec((1, B, d), m, memory_space=pltpu.VMEM)  # noqa: E731
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    fwd = lambda t: (t, 0, 0)  # noqa: E731

    inputs = [x, p1["w"], p1["b"], p1["u"], p2["w"], p2["b"], p2["u"]]
    in_specs = [seq(D, fwd)] + [vm] * 6
    out_shape = [
        jax.ShapeDtypeStruct((T, B, H), dt),
        jax.ShapeDtypeStruct((T, B, H), dt),
    ]
    out_specs = [seq(H, fwd), seq(H, fwd)]
    scratch = [pltpu.VMEM((B, H), dt), pltpu.VMEM((B, H), dt)]
    t_lens = []
    for br in branches:
        xk, pk = _encmb_cast(br["x"], br["p"])
        pk = dict(pk, b=pk["b"].astype(jnp.float32))
        Tk, _, Dk = xk.shape
        t_lens.append(Tk)
        inputs += [xk, pk["w"], pk["b"], pk["u"]]
        in_specs += [
            seq(Dk, lambda t, Tk=Tk: (jnp.minimum(t, Tk - 1), 0, 0)),
            vm, vm, vm,
        ]
        out_shape.append(jax.ShapeDtypeStruct((Tk, B, H), dt))
        out_specs.append(seq(H, lambda t, Tk=Tk: (jnp.minimum(t, Tk - 1), 0, 0)))
        scratch.append(pltpu.VMEM((B, H), dt))

    return pl.pallas_call(
        functools.partial(
            _encmb_fwd_kernel, n_branches=K, t_lens=tuple(t_lens), act=act
        ),
        grid=(T,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)


def encode_multibranch_train_bwd(stack, branches, fwd_outs, g, interpret):
    """Backward: g = (dh2_final, (dhk_final)*K). Returns
    (dx, dw1, db1, du1, dw2, db2, du2, [dxk, dwk, dbk, duk]*K)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = len(branches)
    x = stack["x"]
    T, B, D = x.shape
    H = stack["p1"]["u"].shape[0]
    dt = x.dtype
    f32 = jnp.float32
    p1 = dict(stack["p1"], b=stack["p1"]["b"].astype(jnp.float32))
    p2 = dict(stack["p2"], b=stack["p2"]["b"].astype(jnp.float32))
    h1seq, h2seq = fwd_outs[:2]
    dfinal2, dfinal_ks = g

    seq = lambda d, m: pl.BlockSpec((1, B, d), m, memory_space=pltpu.VMEM)  # noqa: E731
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    mat = lambda s: pl.BlockSpec(s, lambda t: tuple(0 for _ in s),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    rev = lambda s: (T - 1 - s, 0, 0)  # noqa: E731

    inputs = [
        x, h1seq, h1seq, h2seq, dfinal2,
        p1["w"], p1["b"], p1["u"], p2["w"], p2["b"], p2["u"],
    ]
    in_specs = [
        seq(D, rev), seq(H, rev), _hprev_spec(T, B, H), _hprev_spec(T, B, H),
        vm, vm, vm, vm, vm, vm, vm,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, B, D), dt),
        jax.ShapeDtypeStruct((D, 3 * H), f32),
        jax.ShapeDtypeStruct((1, 3 * H), f32),
        jax.ShapeDtypeStruct((H, 3 * H), f32),
        jax.ShapeDtypeStruct((H, 3 * H), f32),
        jax.ShapeDtypeStruct((1, 3 * H), f32),
        jax.ShapeDtypeStruct((H, 3 * H), f32),
    ]
    out_specs = [
        seq(D, rev),
        mat((D, 3 * H)), mat((1, 3 * H)), mat((H, 3 * H)),
        mat((H, 3 * H)), mat((1, 3 * H)), mat((H, 3 * H)),
    ]
    scratch = [pltpu.VMEM((B, H), f32), pltpu.VMEM((B, H), f32)]
    t_lens = []
    for k, br in enumerate(branches):
        xk, pk = _encmb_cast(br["x"], br["p"])
        pk = dict(pk, b=pk["b"].astype(jnp.float32))
        Tk, _, Dk = xk.shape
        t_lens.append(Tk)
        hkseq = fwd_outs[2 + k]
        # reversed + clamped maps: block t for grid step s is
        # clip(T-1-s, 0, Tk-1); the prev-state stream reads t-1 the same way
        revk = lambda s, Tk=Tk: (jnp.clip(T - 1 - s, 0, Tk - 1), 0, 0)
        prevk = lambda s, Tk=Tk: (jnp.clip(T - 2 - s, 0, Tk - 1), 0, 0)
        inputs += [xk, hkseq, dfinal_ks[k], pk["w"], pk["b"], pk["u"]]
        in_specs += [seq(Dk, revk), seq(H, prevk), vm, vm, vm, vm]
        # branch dx emitted in f32: narrow-D bf16 stores hit Mosaic's
        # unimplemented subelement masking -- cast in _encmb_bwd_rule
        out_shape += [
            jax.ShapeDtypeStruct((Tk, B, Dk), f32),
            jax.ShapeDtypeStruct((Dk, 3 * H), f32),
            jax.ShapeDtypeStruct((1, 3 * H), f32),
            jax.ShapeDtypeStruct((H, 3 * H), f32),
        ]
        out_specs += [
            seq(Dk, revk),
            mat((Dk, 3 * H)), mat((1, 3 * H)), mat((H, 3 * H)),
        ]
        scratch.append(pltpu.VMEM((B, H), f32))

    return pl.pallas_call(
        functools.partial(
            _encmb_bwd_kernel, n_branches=K, t_lens=tuple(t_lens), T=T
        ),
        grid=(T,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)


def _encmb_vmem_ok(B, D, dks, H) -> bool:
    # weights + pinned f32 grads + double-buffered per-step stream blocks +
    # shared gate temporaries (reused across the sequentially-issued
    # branches) + f32 carries; same calibration methodology as _mh_vmem_ok
    def layer_w(d):
        return d * 3 * H + H * 3 * H + 3 * H
    weights = layer_w(D) + layer_w(H)
    streams = 8 * B * D + 10 * B * H
    carries = 2 * B * H
    for d in dks:
        weights += layer_w(d)
        streams += 8 * B * max(d, 128) + 4 * B * H
        carries += B * H
    temps = 4 * B * 3 * H + 2 * B * H
    total = (2 * weights + streams + temps + carries) * 4
    # the estimate overcounts (Mosaic drops to single-buffering under
    # pressure): the reference config (B=256, D=61, branches [1, 16],
    # H=256) computes 20.4 MB here and compiles + runs on the 16 MB v5e
    # core (verified, loss matches the per-branch reference)
    return total < 21_000_000


def _encmb_use_pallas(stack, branches, activation, interpret) -> bool:
    if activation != "tanh":  # bwd kernels hardcode the tanh derivative
        return False
    if interpret:
        return all(br["x"].shape[0] <= stack["x"].shape[0] for br in branches)
    T, B, D = stack["x"].shape
    H = stack["p1"]["u"].shape[0]
    return (
        jax.default_backend() == "tpu"
        and activation == "tanh"
        # f32 only (same Mosaic degenerate-K bf16 limitation as the decode
        # multi-head kernel; the per-layer kernels carry the workaround)
        and stack["x"].dtype == jnp.float32
        and all(br["x"].shape[0] <= T for br in branches)
        and _encmb_vmem_ok(B, D, [br["x"].shape[-1] for br in branches], H)
    )


def _encmb_reference(stack, branches, act):
    x = stack["x"]
    B = x.shape[1]
    H = stack["p1"]["u"].shape[0]
    zero = jnp.zeros((B, H), x.dtype)
    h1 = _gru_layer_reference_x(
        x, zero, stack["p1"]["w"], stack["p1"]["b"], stack["p1"]["u"], act,
        True,
    )
    h2 = _gru_layer_reference_x(
        h1, zero, stack["p2"]["w"], stack["p2"]["b"], stack["p2"]["u"], act,
        False,
    )
    finals = tuple(
        _gru_layer_reference_x(
            br["x"], zero, br["p"]["w"], br["p"]["b"], br["p"]["u"], act,
            False,
        )
        for br in branches
    )
    return h2, finals


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gru_encode_multibranch_train(
    stack, branches, activation: str, interpret: bool
):
    """Fused multi-branch encode: 2-layer notes stack + K 1-layer branches.

    stack: {'x': (T, B, D) time-major, 'p1': {w,b,u}, 'p2': {w,b,u}};
    branches: tuple of {'x': (Tk, B, Dk), 'p': {w,b,u}} with Tk <= T.
    ALL initial states are zeros (the model's encoder contract). Returns
    (h2_final, (hk_final,)*K), each (B, H). One Pallas kernel forward, one
    backward, for the stack and every branch together."""
    if not _encmb_use_pallas(stack, branches, activation, interpret):
        return _encmb_reference(stack, branches, _activation(activation))
    outs = encode_multibranch_train_fwd(stack, branches, activation, interpret)
    return outs[1][-1], tuple(outs[2 + k][-1] for k in range(len(branches)))


def _encmb_fwd_rule(stack, branches, activation, interpret):
    if not _encmb_use_pallas(stack, branches, activation, interpret):
        out, vjp = jax.vjp(
            lambda s, b: _encmb_reference(s, b, _activation(activation)),
            stack, branches,
        )
        return out, (vjp,)
    outs = encode_multibranch_train_fwd(stack, branches, activation, interpret)
    result = (
        outs[1][-1], tuple(outs[2 + k][-1] for k in range(len(branches)))
    )
    return result, (stack, branches, outs)


def _encmb_bwd_rule(activation, interpret, residuals, g):
    if len(residuals) == 1:
        (vjp,) = residuals
        return vjp(g)
    stack, branches, fwd_outs = residuals
    outs = encode_multibranch_train_bwd(stack, branches, fwd_outs, g,
                                        interpret)
    cast = lambda a, p: a.astype(p.dtype)  # noqa: E731
    (dx, dw1, db1, du1, dw2, db2, du2) = outs[:7]
    d_stack = {
        "x": dx,
        "p1": {"w": cast(dw1, stack["p1"]["w"]),
               "b": cast(db1[0], stack["p1"]["b"]),
               "u": cast(du1, stack["p1"]["u"])},
        "p2": {"w": cast(dw2, stack["p2"]["w"]),
               "b": cast(db2[0], stack["p2"]["b"]),
               "u": cast(du2, stack["p2"]["u"])},
    }
    d_branches = []
    for k, br in enumerate(branches):
        dxk, dwk, dbk, duk = outs[7 + 4 * k : 11 + 4 * k]
        d_branches.append({
            "x": dxk.astype(br["x"].dtype),
            "p": {"w": cast(dwk, br["p"]["w"]),
                  "b": cast(dbk[0], br["p"]["b"]),
                  "u": cast(duk, br["p"]["u"])},
        })
    return d_stack, tuple(d_branches)


gru_encode_multibranch_train.defvjp(_encmb_fwd_rule, _encmb_bwd_rule)

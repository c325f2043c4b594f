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

def _fwd_kernel(xp_ref, h0_ref, u_ref, seq_ref, h_s, *, act):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

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
    xp_ref, hprev_ref, dseq_ref, dfinal_ref, u_ref,
    dxp_ref, dh0_ref, du_ref,
    dh_s, du_s,
    *, return_sequences,
):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)           # 0 .. T-1, walking t = T-1 .. 0
    H = dh_s.shape[-1]

    @pl.when(step == 0)
    def _init():
        du_s[:] = jnp.zeros_like(du_s)
        if return_sequences:
            dh_s[:] = jnp.zeros_like(dh_s)
        else:
            dh_s[:] = dfinal_ref[:].astype(dh_s.dtype)

    xp = xp_ref[0]
    h = hprev_ref[0]                  # h_{t-1}
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
    du_s[:, : 2 * H] += _outer_acc(h, da_zr)
    du_s[:, 2 * H :] += _outer_acc(rh, da)

    new_dh = dh * z + drh * r + _dot_t(da_zr, u[:, : 2 * H])
    dh_s[:] = new_dh.astype(dh_s.dtype)

    @pl.when(step == pl.num_programs(0) - 1)
    def _final():
        dh0_ref[:] = new_dh.astype(dh0_ref.dtype)
        du_ref[:] = du_s[:].astype(du_ref.dtype)


def _bwd_pallas(xp, h_prev_seq, d_seq, d_final, u, return_sequences, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, _ = xp.shape
    H = u.shape[0]
    rev = lambda t: (T - 1 - t, 0, 0)  # noqa: E731

    out_shape = (
        jax.ShapeDtypeStruct((T, B, 3 * H), xp.dtype),   # dxp
        jax.ShapeDtypeStruct((B, H), xp.dtype),          # dh0
        jax.ShapeDtypeStruct((H, 3 * H), u.dtype),       # du
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, return_sequences=return_sequences),
        grid=(T,),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec((1, B, 3 * H), rev, memory_space=pltpu.VMEM),  # xp
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),      # hprev
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
            pltpu.VMEM((H, 3 * H), jnp.float32),    # dU accumulator
        ],
        interpret=interpret,
    )(xp, h_prev_seq, d_seq, d_final, u)


def _train_vmem_ok(B: int, H: int) -> bool:
    # bwd holds: u (H,3H), du scratch (H,3H f32), dh (B,H f32), per-step
    # blocks xp/dxp (B,3H)x2, hprev/dseq (B,H)x2, gate temps ~6*(B,H)
    floats = 2 * H * 3 * H + B * H + 2 * B * 3 * H + 2 * B * H + 8 * B * H
    from .fused_gru import _VMEM_LIMIT_BYTES

    return floats * 4 < _VMEM_LIMIT_BYTES and _encoder_vmem_ok(B, H)


def _use_pallas(xp, h0, activation, interpret) -> bool:
    if interpret:
        return True
    return (
        jax.default_backend() == "tpu"
        and activation == "tanh"
        and _train_vmem_ok(xp.shape[1], h0.shape[-1])
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
    residual output)."""
    act = _activation(activation)
    if not _use_pallas(xp, h0, activation, interpret):
        return _encoder_scan_reference(xp, h0, u, act, return_sequences)
    seq = _fwd_pallas(xp, h0, u, activation, interpret)
    return seq if return_sequences else seq[-1]


def _glt_fwd(xp, h0, u, activation, return_sequences, interpret):
    act = _activation(activation)
    if not _use_pallas(xp, h0, activation, interpret):
        out, vjp = jax.vjp(
            lambda a, b, c: _encoder_scan_reference(
                a, b, c, act, return_sequences
            ),
            xp, h0, u,
        )
        return out, (vjp,)
    seq = _fwd_pallas(xp, h0, u, activation, interpret)
    out = seq if return_sequences else seq[-1]
    return out, (xp, h0, u, seq)


def _glt_bwd(activation, return_sequences, interpret, residuals, g):
    if len(residuals) == 1:  # jnp fallback path
        (vjp,) = residuals
        return vjp(g)
    xp, h0, u, seq = residuals
    h_prev_seq = jnp.concatenate([h0[None], seq[:-1]], axis=0)
    if return_sequences:
        d_seq = g
        d_final = jnp.zeros_like(h0)
    else:
        d_seq = jnp.zeros_like(seq[:1])  # dummy block, never read
        d_final = g
    dxp, dh0, du = _bwd_pallas(
        xp, h_prev_seq, d_seq, d_final, u, return_sequences, interpret
    )
    return dxp, dh0, du


gru_layer_train.defvjp(_glt_fwd, _glt_bwd)

"""Pallas TPU kernel: fused GRU step.

The hot op of this framework is the recurrent step inside the encode and
decode scans (SURVEY.md §7 step 7): two matmuls (x@W on the MXU, h@U on the
MXU) plus the sigmoid/tanh gate math on the VPU. XLA compiles these as
separate HLOs with HBM round-trips between them; this kernel fuses the whole
step -- both matmuls and all gate elementwise -- into one pallas_call so the
intermediates never leave VMEM.

Two variants:
  * ``gru_step``          : full step  (x, h, W, U, b)       -> h'
    used in the autoregressive decoder where x is fed back and cannot be
    precomputed (models/rnn.py decode_autoregressive),
  * ``gru_recurrent_step``: recurrent-only (xp, h, U)        -> h'
    used in sequence encoders where x@W+b for ALL timesteps is batched into
    one large matmul before the scan (models/rnn.py _scan_layer).

Both have a pure-jnp fallback with identical math (used on CPU, in tests via
interpret mode, and whenever shapes don't fit VMEM).

Gate math (classic reset-before GRU, matching models/cells.py GRUCell):
  z = sigmoid(xw_z + h@U_z);  r = sigmoid(xw_r + h@U_r)
  hh = act(xw_h + (r*h)@U_h);  h' = z*h + (1-z)*hh
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# VMEM budget check: keep well under the ~16MB/core budget
_VMEM_LIMIT_BYTES = 12 * 1024 * 1024


def _fits_vmem(B: int, D: int, H: int, itemsize: int = 4) -> bool:
    # operand-dtype residents (weights + activations) are charged at the
    # operands' itemsize -- bf16 halves them, which is what lets bf16 keep
    # the fused kernels at twice the layer width -- while gate temporaries
    # (accumulated at f32 via preferred_element_type) stay at 4 bytes.
    operand = (
        B * D          # x
        + B * H        # h
        + D * 3 * H    # W
        + H * 3 * H    # U
        + 3 * H        # b
        + B * H        # out
    )
    f32 = 2 * B * 3 * H  # gate scratch headroom
    return operand * itemsize + f32 * 4 < _VMEM_LIMIT_BYTES


def _gru_full_kernel(x_ref, h_ref, w_ref, u_ref, b_ref, out_ref, *, act):
    H = h_ref.shape[-1]
    x = x_ref[:]
    h = h_ref[:]
    xw = (
        jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32) + b_ref[:]
    )
    hu_zr = jnp.dot(h, u_ref[:, : 2 * H], preferred_element_type=jnp.float32)
    z = jax.nn.sigmoid(xw[:, :H] + hu_zr[:, :H])
    r = jax.nn.sigmoid(xw[:, H : 2 * H] + hu_zr[:, H:])
    hh = act(
        xw[:, 2 * H :]
        + jnp.dot(r * h, u_ref[:, 2 * H :], preferred_element_type=jnp.float32)
    )
    out_ref[:] = (z * h + (1.0 - z) * hh).astype(out_ref.dtype)


def _gru_recurrent_kernel(xp_ref, h_ref, u_ref, out_ref, *, act):
    H = h_ref.shape[-1]
    xp = xp_ref[:]
    h = h_ref[:]
    hu_zr = jnp.dot(h, u_ref[:, : 2 * H], preferred_element_type=jnp.float32)
    z = jax.nn.sigmoid(xp[:, :H] + hu_zr[:, :H])
    r = jax.nn.sigmoid(xp[:, H : 2 * H] + hu_zr[:, H:])
    hh = act(
        xp[:, 2 * H :]
        + jnp.dot(r * h, u_ref[:, 2 * H :], preferred_element_type=jnp.float32)
    )
    out_ref[:] = (z * h + (1.0 - z) * hh).astype(out_ref.dtype)


def _activation(name: str):
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unsupported fused-GRU activation {name!r}")


def _gru_step_pallas(x, h, w, u, b, activation: str, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    B, D = x.shape
    H = h.shape[-1]
    if not interpret and (
        jax.default_backend() not in ("tpu",)
        or not _fits_vmem(B, D, H, x.dtype.itemsize)
    ):
        return _gru_step_reference(x, h, w, u, b, act)
    kernel = functools.partial(_gru_full_kernel, act=act)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, h, w, u, b)


def _gru_recurrent_pallas(xp, h, u, activation: str, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    act = _activation(activation)
    B = xp.shape[0]
    H = h.shape[-1]
    if not interpret and (
        jax.default_backend() not in ("tpu",)
        or not _fits_vmem(B, 0, H, xp.dtype.itemsize)
    ):
        return _gru_recurrent_reference(xp, h, u, act)
    kernel = functools.partial(_gru_recurrent_kernel, act=act)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H), xp.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, h, u)


# custom VJP: fused Pallas forward, pure-jnp (XLA-fused) backward -- this
# makes the kernels usable inside the differentiated training step.

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gru_step(x, h, w, u, b, activation: str = "tanh", interpret: bool = False):
    """Fused full GRU step on TPU; plain-jnp fallback off-TPU; differentiable."""
    return _gru_step_pallas(x, h, w, u, b, activation, interpret)


def _gru_step_fwd(x, h, w, u, b, activation, interpret):
    out = _gru_step_pallas(x, h, w, u, b, activation, interpret)
    return out, (x, h, w, u, b)


def _gru_step_bwd(activation, interpret, residuals, g):
    x, h, w, u, b = residuals
    act = _activation(activation)
    _, vjp = jax.vjp(lambda *args: _gru_step_reference(*args, act), x, h, w, u, b)
    return vjp(g)


gru_step.defvjp(_gru_step_fwd, _gru_step_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gru_recurrent_step(xp, h, u, activation: str = "tanh", interpret: bool = False):
    """Fused recurrent-only GRU step (x-projection precomputed); differentiable."""
    return _gru_recurrent_pallas(xp, h, u, activation, interpret)


def _gru_recurrent_fwd(xp, h, u, activation, interpret):
    out = _gru_recurrent_pallas(xp, h, u, activation, interpret)
    return out, (xp, h, u)


def _gru_recurrent_bwd(activation, interpret, residuals, g):
    xp, h, u = residuals
    act = _activation(activation)
    _, vjp = jax.vjp(lambda *args: _gru_recurrent_reference(*args, act), xp, h, u)
    return vjp(g)


gru_recurrent_step.defvjp(_gru_recurrent_fwd, _gru_recurrent_bwd)


def _gru_step_reference(x, h, w, u, b, act):
    H = h.shape[-1]
    xw = x @ w + b
    hu_zr = h @ u[:, : 2 * H]
    z = jax.nn.sigmoid(xw[:, :H] + hu_zr[:, :H])
    r = jax.nn.sigmoid(xw[:, H : 2 * H] + hu_zr[:, H:])
    hh = act(xw[:, 2 * H :] + (r * h) @ u[:, 2 * H :])
    return z * h + (1.0 - z) * hh


def _gru_recurrent_reference(xp, h, u, act):
    H = h.shape[-1]
    hu_zr = h @ u[:, : 2 * H]
    z = jax.nn.sigmoid(xp[:, :H] + hu_zr[:, :H])
    r = jax.nn.sigmoid(xp[:, H : 2 * H] + hu_zr[:, H:])
    hh = act(xp[:, 2 * H :] + (r * h) @ u[:, 2 * H :])
    return z * h + (1.0 - z) * hh


def make_fused_decoder_step(activation: str = "tanh", interpret: bool = False):
    """Adapter with the (params, x, states) -> (out, states) signature used
    by models/rnn.py decode_autoregressive(fused_step=...)."""

    def step(p, x, states):
        (h,) = states
        new_h = gru_step(
            x, h, p["w"], p["u"], p["b"], activation=activation,
            interpret=interpret,
        )
        return new_h, (new_h,)

    return step

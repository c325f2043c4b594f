"""RNN cell parameters and step functions (GRU / LSTM / SimpleRNN).

The reference delegates its recurrent compute to Keras layers and
recurrentshop cells (/root/reference/vae_definition.py:443-516, :519-728).
Here each cell is a parameter pytree + a pure step function designed for
``jax.lax.scan``:

* the input projection ``x @ W`` is kept separable from the recurrent part so
  sequence encoders can batch it over all timesteps in ONE large matmul (MXU
  friendly) before scanning,
* gate order and update rules follow classic (reset-before) GRU and standard
  LSTM, matching the Keras-era cells the reference trains,
* initializers mirror Keras defaults: glorot_uniform kernels, orthogonal
  recurrent kernels, zero biases.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


def _np_rng(key) -> np.random.Generator:
    """Numpy generator seeded from a jax PRNG key (or a raw uint32 pair).

    Initialization runs as PLAIN NUMPY end to end: eager jax init ops each
    compile a tiny XLA executable too fast to enter the persistent compile
    cache, so every fresh process re-pays ~40s (minutes over a tunneled
    TPU); numpy init is instant and deterministic per key. Callers place
    the finished tree on devices (parallel.shard_params)."""
    if isinstance(key, np.ndarray):
        data = key  # already host-side: do NOT round-trip through a device
    else:
        try:
            data = np.asarray(jax.random.key_data(key))
        except (TypeError, AttributeError):
            data = np.asarray(key)
    return np.random.default_rng(data.astype(np.uint32).tolist())


def split_keys(key, n: int = 2) -> np.ndarray:
    """Numpy-side key derivation for init: (n, 2) uint32 child keys.

    Replaces eager ``jax.random.split`` + per-element jax-array indexing in
    the init path (each index op compiled its own executable)."""
    return _np_rng(key).integers(0, 2**32, size=(n, 2), dtype=np.uint32)


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return np.asarray(
        _np_rng(key).uniform(-limit, limit, size=shape), dtype
    )


def orthogonal(key, shape, dtype=jnp.float32):
    """Orthogonal init (rows or columns orthonormal), Keras-style."""
    rows, cols = shape
    big, small = max(rows, cols), min(rows, cols)
    a = _np_rng(key).normal(size=(big, small))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if rows < cols:
        q = q.T
    return np.asarray(q[:rows, :cols], dtype)


def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    return {
        "w": glorot_uniform(key, (in_dim, out_dim), dtype),
        "b": np.zeros((out_dim,), dtype),
    }


def dense_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "linear": lambda x: x,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
    "softplus": jax.nn.softplus,
    "elu": jax.nn.elu,
}


def activation_fn(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}") from None


def _hard_sigmoid(x):
    """Keras-2.0.x hard_sigmoid: clip(0.2x + 0.5, 0, 1) -- the gate
    activation the reference's Keras era defaulted to."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


_GATE_ACTIVATIONS = {"sigmoid": jax.nn.sigmoid, "hard_sigmoid": _hard_sigmoid}


def gate_activation_fn(name: str):
    try:
        return _GATE_ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown gate activation {name!r}") from None


# ---------------------------------------------------------------------------
# Cell definitions. Each provides:
#   init(key, in_dim, hidden)            -> params
#   num_states                           -> 1 (GRU/SimpleRNN) or 2 (LSTM)
#   x_proj(params, x)                    -> gates input contribution
#   step(params, xp, states, activation) -> (output, new_states)
# where `xp` is the precomputed x-projection for this timestep.
# ---------------------------------------------------------------------------

class GRUCell:
    num_states = 1
    gate_mult = 3

    @staticmethod
    def init(key, in_dim: int, hidden: int, dtype=jnp.float32) -> Params:
        k1, k2 = split_keys(key)
        return {
            "w": glorot_uniform(k1, (in_dim, 3 * hidden), dtype),
            "u": orthogonal(k2, (hidden, 3 * hidden), dtype),
            "b": np.zeros((3 * hidden,), dtype),
        }

    @staticmethod
    def x_proj(p: Params, x: jnp.ndarray) -> jnp.ndarray:
        return x @ p["w"] + p["b"]

    @staticmethod
    def step(
        p: Params, xp: jnp.ndarray, states, act, gate_act=jax.nn.sigmoid
    ) -> tuple[jnp.ndarray, tuple]:
        (h,) = states
        hidden = h.shape[-1]
        u = p["u"]
        hu_zr = h @ u[:, : 2 * hidden]
        xz, xr, xh = jnp.split(xp, 3, axis=-1)
        hz, hr = jnp.split(hu_zr, 2, axis=-1)
        z = gate_act(xz + hz)
        r = gate_act(xr + hr)
        hh = act(xh + (r * h) @ u[:, 2 * hidden :])
        new_h = z * h + (1.0 - z) * hh
        return new_h, (new_h,)


class LSTMCell:
    num_states = 2
    gate_mult = 4

    @staticmethod
    def init(key, in_dim: int, hidden: int, dtype=jnp.float32) -> Params:
        k1, k2 = split_keys(key)
        b = np.zeros((4 * hidden,), dtype)
        # Keras unit_forget_bias: forget gate bias = 1
        b[hidden : 2 * hidden] = 1.0
        return {
            "w": glorot_uniform(k1, (in_dim, 4 * hidden), dtype),
            "u": orthogonal(k2, (hidden, 4 * hidden), dtype),
            "b": b,
        }

    @staticmethod
    def x_proj(p: Params, x: jnp.ndarray) -> jnp.ndarray:
        return x @ p["w"] + p["b"]

    @staticmethod
    def step(
        p: Params, xp: jnp.ndarray, states, act, gate_act=jax.nn.sigmoid
    ) -> tuple[jnp.ndarray, tuple]:
        h, c = states
        gates = xp + h @ p["u"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = gate_act(i)
        f = gate_act(f)
        g = act(g)
        o = gate_act(o)
        new_c = f * c + i * g
        new_h = o * act(new_c)
        return new_h, (new_h, new_c)


class SimpleRNNCell:
    num_states = 1
    gate_mult = 1

    @staticmethod
    def init(key, in_dim: int, hidden: int, dtype=jnp.float32) -> Params:
        k1, k2 = split_keys(key)
        return {
            "w": glorot_uniform(k1, (in_dim, hidden), dtype),
            "u": orthogonal(k2, (hidden, hidden), dtype),
            "b": np.zeros((hidden,), dtype),
        }

    @staticmethod
    def x_proj(p: Params, x: jnp.ndarray) -> jnp.ndarray:
        return x @ p["w"] + p["b"]

    @staticmethod
    def step(
        p: Params, xp: jnp.ndarray, states, act, gate_act=jax.nn.sigmoid
    ) -> tuple[jnp.ndarray, tuple]:
        (h,) = states
        new_h = act(xp + h @ p["u"])
        return new_h, (new_h,)


_CELLS = {"GRU": GRUCell, "LSTM": LSTMCell, "SimpleRNN": SimpleRNNCell}


def get_cell(cell_type: str):
    try:
        return _CELLS[cell_type]
    except KeyError:
        raise ValueError(f"unknown cell_type {cell_type!r}") from None


def zero_states(cell, batch: int, hidden: int, dtype=jnp.float32) -> tuple:
    return tuple(
        jnp.zeros((batch, hidden), dtype) for _ in range(cell.num_states)
    )

"""Device mesh + sharding helpers: the framework's SPMD layer.

The reference has **no** distributed code (single-process Keras ``fit``,
SURVEY.md §2.3); this module is the TPU-native design the rebuild defines
itself: a ``jax.sharding.Mesh`` with ('data', 'model') axes, batch sharding
over 'data' (DP), optional tensor sharding of gate/dense output dims over
'model' (TP), with XLA GSPMD inserting the ICI collectives.

The same code paths run on one real TPU chip, a v5e-8 slice, or a virtual
8-device CPU mesh (``--xla_force_host_platform_device_count``), which is how
multi-chip behavior is tested without a cluster.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. n_data=None => all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None or n_data <= 0:
        if n % n_model != 0:
            raise ValueError(f"{n} devices not divisible by model axis {n_model}")
        n_data = n // n_model
    use = n_data * n_model
    if use > n:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {use} devices, only {n} available"
        )
    arr = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data parallelism."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place every array of a batch dict with its leading axis on 'data'."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(jnp.asarray(v), sh) for k, v in batch.items()}


def _tp_spec(path_leaf: tuple, leaf: jnp.ndarray, n_model: int) -> P:
    """Tensor-parallel spec for one parameter leaf.

    Policy: shard the OUTPUT (last) dim of matmul weights over 'model' when
    divisible; biases/vectors sharded on their only dim when divisible. The
    recurrent state stays replicated; GSPMD inserts the all-gathers between
    the column-parallel gate matmul and the elementwise gate math.
    """
    if leaf.ndim >= 2 and leaf.shape[-1] % n_model == 0:
        return P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
    if leaf.ndim == 1 and leaf.shape[0] % n_model == 0:
        return P(MODEL_AXIS)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Per-leaf NamedShardings: replicated for DP-only meshes, tensor-sharded
    over 'model' when that axis is >1."""
    n_model = mesh.shape[MODEL_AXIS]
    if n_model == 1:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda _: rep, params)

    def spec(leaf):
        return NamedSharding(mesh, _tp_spec((), leaf, n_model))

    return jax.tree_util.tree_map(spec, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def jit_optimizer_init(optimizer, params: Any, mesh: Mesh) -> Any:
    """Optimizer init as ONE jitted program with explicit out_shardings
    (moments shard like their params).

    Eager optax init is ~2 tiny dispatches PER LEAF -- tens of seconds over
    a tunneled chip; used by both the VAE and classifier trainers."""
    return jax.jit(
        optimizer.init,
        out_shardings=param_shardings(
            jax.eval_shape(optimizer.init, params), mesh
        ),
    )(params)


def pad_batch_to(batch: dict, size: int) -> tuple[dict, np.ndarray]:
    """Pad a (possibly short) batch dict to ``size`` rows; returns the padded
    batch and a float mask (size,) with 1 on real rows.

    Keeps jit shapes static across the last partial batch of an epoch.
    """
    n = next(iter(batch.values())).shape[0]
    mask = np.zeros((size,), np.float32)
    mask[:n] = 1.0
    if n == size:
        return dict(batch), mask
    out = {}
    for k, v in batch.items():
        pad = np.zeros((size - n, *v.shape[1:]), dtype=v.dtype)
        out[k] = np.concatenate([np.asarray(v), pad], axis=0)
    return out, mask

"""Checkpoint save/restore (orbax), improving on the reference.

The reference saves bare Keras weights every ``save_step`` epochs and does
NOT persist optimizer state (vae_training.py:966-978; resume restarts Adam
moments). Here a checkpoint is the full training state: params, optimizer
state, epoch, and PRNG key, plus the config JSON next to it -- so resume is
exact.
"""

from __future__ import annotations

import os


import numpy as np

from ..config import Config


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(
    ckpt_dir: str, epoch: int, params, opt_state, rng, cfg: Config | None
) -> str:
    """Write the full training state; cfg=None skips the config.json (the
    classifier trainer writes its spec.json instead)."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    state = {
        "params": params,
        "opt_state": opt_state,
        "epoch": np.asarray(epoch),
        "rng": rng,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    if cfg is not None:
        cfg.save(os.path.join(ckpt_dir, "config.json"))
    return path


def latest_epoch(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    epochs = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("epoch_"):
            try:
                epochs.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(epochs) if epochs else None


def restore_checkpoint(
    ckpt_dir: str, epoch: int | None = None, template=None
) -> dict:
    """Restore a checkpoint; epoch=None means the latest one."""
    ocp = _ocp()
    if epoch is None:
        epoch = latest_epoch(ckpt_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            state = ckptr.restore(path, template)
        else:
            state = ckptr.restore(path)
    state["epoch"] = int(np.asarray(state["epoch"]))
    return state


def load_config(ckpt_dir: str) -> Config:
    return Config.load(os.path.join(ckpt_dir, "config.json"))

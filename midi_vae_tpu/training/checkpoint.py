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


_CHECKPOINTER = None


def _checkpointer():
    """One process-wide StandardCheckpointer: constructing one per save adds
    seconds of setup to every save-cadence boundary."""
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = _ocp().StandardCheckpointer()
    return _CHECKPOINTER


def save_checkpoint(
    ckpt_dir: str, epoch: int, params, opt_state, rng, cfg: Config | None,
    wait: bool = True,
) -> str:
    """Write the full training state; cfg=None skips the config.json (the
    classifier trainer writes its spec.json instead).

    ``wait=False`` returns once the arrays are staged (orbax's async commit
    finishes the filesystem write in its own thread); callers must call
    ``wait_pending()`` before relying on the checkpoint on disk. The
    trainer's background writer uses this so the device fetch of save N+1
    overlaps the disk write of save N."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    state = {
        "params": params,
        "opt_state": opt_state,
        "epoch": np.asarray(epoch),
        "rng": rng,
    }
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    if wait:
        ckptr.wait_until_finished()
    if cfg is not None:
        cfg.save(os.path.join(ckpt_dir, "config.json"))
    return path


def wait_pending() -> None:
    """Block until every async checkpoint commit has finished."""
    if _CHECKPOINTER is not None:
        _CHECKPOINTER.wait_until_finished()


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
    ckptr = _checkpointer()
    if template is not None:
        state = ckptr.restore(path, template)
    else:
        state = ckptr.restore(path)
    state["epoch"] = int(np.asarray(state["epoch"]))
    return state


def restore_vae_state(ckpt_dir: str, epoch: int | None = None) -> dict:
    """Template-checked restore for the inference CLIs (generate /
    transfer / evaluate): builds the training-state template from the
    run's config.json (params via ``MidiVAE.init_params``, optimizer
    state via ``make_optimizer(cfg).init``) so orbax validates structure
    and dtypes instead of the structureless restore it warns is UNSAFE.
    Returns the restored state dict (``params``/``opt_state``/``epoch``/
    ``rng``)."""
    import jax

    from ..models.vae import MidiVAE

    # local import: trainer imports this module at its own top level
    from .trainer import make_optimizer

    cfg = load_config(ckpt_dir)
    params = MidiVAE(cfg).init_params(jax.random.PRNGKey(0))
    template = {
        "params": params,
        "opt_state": make_optimizer(cfg).init(params),
        "epoch": np.asarray(0),
        "rng": jax.random.PRNGKey(0),
    }
    return restore_checkpoint(ckpt_dir, epoch, template)


def load_config(ckpt_dir: str) -> Config:
    path = os.path.join(ckpt_dir, "config.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no config.json under {ckpt_dir!r} -- is this a run directory "
            "(train.py --output)?"
        )
    return Config.load(path)

"""Preemption-safe training: SIGTERM/SIGINT during fit() checkpoints the
last completed epoch and exits cleanly; resume continues exactly.

TPU pods get preempted; the reference has no failure handling beyond
skipping unreadable MIDI files (SURVEY.md §5, import_midi.py:17-22). Two
legs: an in-process signal raised mid-fit (deterministic, enables the
bit-exact resumed-vs-uninterrupted comparison) and a real subprocess kill
(proves signal delivery + clean exit through the CLI-style path).
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

import jax
import numpy as np

from midi_vae_tpu.config import small_test_config
from midi_vae_tpu.parallel import make_mesh
from midi_vae_tpu.training import VAETrainer
from midi_vae_tpu.utils.synthetic import synthetic_flat

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg():
    # history via the per-epoch encode pass (not the z cache): H is a pure
    # function of (params, data), so a killed+resumed run is bit-identical
    # to an uninterrupted one. save_step beyond the horizon: the only
    # checkpoint is the preemption-stop one.
    return small_test_config(
        batch_size=8, save_step=1000, test_step=1000,
        history_from_train_z=False,
    )


class TestInProcessSignal:
    @pytest.mark.slow
    def test_sigterm_checkpoints_and_resume_is_bit_exact(self, tmp_path):
        cfg = _cfg()
        flat = synthetic_flat(cfg)
        mesh = make_mesh(devices=[jax.devices()[0]])
        epochs = 12

        # uninterrupted run (same chunking as the preempted+resumed run)
        t_ref = VAETrainer(cfg, mesh=mesh)
        t_ref.max_epochs_per_dispatch = 2
        s_ref = t_ref.init_state(seed=0)
        t_ref.fit(s_ref, flat, epochs=epochs, log_fn=lambda s: None, plot=False)

        # preempted run: raise SIGTERM from the log callback after the
        # second chunk; fit() must stop at the boundary and checkpoint
        out = str(tmp_path / "run")
        t_kill = VAETrainer(cfg, mesh=mesh)
        t_kill.max_epochs_per_dispatch = 2
        s_kill = t_kill.init_state(seed=0)
        handler_before = signal.getsignal(signal.SIGTERM)
        calls = {"n": 0}

        def log_fn(msg):
            calls["n"] += 1
            if calls["n"] == 2:
                os.kill(os.getpid(), signal.SIGTERM)

        t_kill.fit(s_kill, flat, epochs=epochs, output_dir=out,
                   log_fn=log_fn, plot=False)
        stopped_at = s_kill.epoch
        assert 0 < stopped_at < epochs, stopped_at
        # the pre-fit SIGTERM disposition is restored after fit
        assert signal.getsignal(signal.SIGTERM) == handler_before

        from midi_vae_tpu.training import checkpoint as ckpt

        assert ckpt.latest_epoch(out) == stopped_at - 1

        # resume to completion; trajectory must equal the uninterrupted run
        t_res = VAETrainer(cfg, mesh=mesh)
        t_res.max_epochs_per_dispatch = 2
        s_res = t_res.restore(out)
        assert s_res.epoch == stopped_at
        t_res.fit(s_res, flat, epochs=epochs, output_dir=out,
                  log_fn=lambda s: None, plot=False)
        assert s_res.epoch == epochs

        for a, b in zip(
            jax.tree_util.tree_leaves(s_ref.params),
            jax.tree_util.tree_leaves(s_res.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, %(repo)r)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from midi_vae_tpu.config import small_test_config
    from midi_vae_tpu.training import VAETrainer
    from midi_vae_tpu.utils.synthetic import synthetic_flat

    cfg = small_test_config(batch_size=8, save_step=1000, test_step=1000,
                            history_from_train_z=False)
    flat = synthetic_flat(cfg, n_songs=8, windows_per_song=8)
    trainer = VAETrainer(cfg)
    trainer.max_epochs_per_dispatch = 2
    state = trainer.init_state(seed=0)
    def log(msg):
        print(msg, flush=True)
    trainer.fit(state, flat, epochs=100000, output_dir=%(out)r,
                log_fn=log, plot=False)
    print("CLEAN_EXIT epoch", state.epoch, flush=True)
    """
)


class TestSubprocessKill:
    @pytest.mark.slow
    def test_sigterm_kills_training_subprocess_cleanly(self, tmp_path):
        out = str(tmp_path / "run")
        script = tmp_path / "worker.py"
        script.write_text(WORKER % {"repo": REPO, "out": out})
        env = dict(os.environ)
        proc = subprocess.Popen(
            [sys.executable, str(script)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, bufsize=1,
        )
        # wait until training demonstrably progresses, then SIGTERM
        lines = []
        deadline = time.time() + 300
        while time.time() < deadline:
            line = proc.stdout.readline()
            lines.append(line)
            if line.startswith("epoch") and not line.startswith("epoch 1:"):
                break
        proc.send_signal(signal.SIGTERM)
        try:
            stdout, stderr = proc.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            proc.kill()
            raise
        assert proc.returncode == 0, stderr[-2000:]
        full = "".join(lines) + stdout
        assert "stop signal received" in full, full[-2000:]
        assert "CLEAN_EXIT" in full

        from midi_vae_tpu.training import checkpoint as ckpt

        saved = ckpt.latest_epoch(out)
        assert saved is not None and saved < 99999

        # the checkpoint restores and continues
        cfg = small_test_config(batch_size=8, save_step=1000, test_step=1000,
                                history_from_train_z=False)
        flat = synthetic_flat(cfg, n_songs=8, windows_per_song=8)
        trainer = VAETrainer(cfg, mesh=make_mesh(devices=[jax.devices()[0]]))
        state = trainer.restore(out)
        assert state.epoch == saved + 1
        trainer.fit(state, flat, epochs=state.epoch + 2,
                    log_fn=lambda s: None, plot=False)
        assert state.epoch == saved + 3

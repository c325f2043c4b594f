#!/usr/bin/env python
"""Device-side profile of the training step: per-op time from the TPU trace.

Wall-clock timing on this environment is unreliable twice over -- the axon
tunnel adds a multi-ms floor per host->device dispatch, and the shared chip
is time-sliced with other tenants (2-4x swings). The ONLY trustworthy
numbers are the device-side op durations recorded by the TPU tracer. This
tool runs K train steps inside one jitted program (so dispatch overhead is
out of the picture), captures a jax.profiler trace, and prints the
per-step cost of every XLA op, Pallas kernel, and while-loop body.

Usage:
    python tools/profile_step.py [--steps 20] [--set KEY=VALUE ...]

Requires tensorboard-plugin-profile's xplane proto (parsed directly; the
plugin's own converter is incompatible with the installed TF). Run under
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if protobuf complains.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import shutil
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture(steps: int, overrides: dict) -> str:
    import jax
    import numpy as np

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.parallel import make_mesh, shard_batch
    from midi_vae_tpu.parallel.mesh import pad_batch_to
    from midi_vae_tpu.training import VAETrainer
    from midi_vae_tpu.training.trainer import _slice_batch
    from midi_vae_tpu.utils.synthetic import synthetic_flat

    cfg = Config(**overrides)
    mesh = make_mesh()
    tr = VAETrainer(cfg, mesh=mesh)
    st = tr.init_state(seed=0)
    flat = synthetic_flat(cfg, n_songs=8, windows_per_song=cfg.batch_size // 8)
    batch = _slice_batch(flat, np.arange(cfg.batch_size), cfg, None)
    batch, mask = pad_batch_to(batch, cfg.batch_size)
    batch["M"] = mask
    batch = shard_batch(batch, mesh)

    @jax.jit
    def multi(params, opt_state, rng):
        def body(carry, _):
            p, o, r = carry
            p, o, r, m = tr.train_step(p, o, batch, r)
            return (p, o, r), m["loss"]

        return jax.lax.scan(
            body, (params, opt_state, rng), None, length=steps
        )[1]

    jax.block_until_ready(multi(st.params, st.opt_state, st.rng))
    out_dir = tempfile.mkdtemp(prefix="midi_vae_prof_")
    with jax.profiler.trace(out_dir):
        jax.block_until_ready(multi(st.params, st.opt_state, st.rng))
    return out_dir


def capture_epoch(epochs: int, overrides: dict) -> tuple[str, int]:
    """Trace the PRODUCTION epoch program (run_epochs_device) on the
    bench.py workload: 4096 windows = 16 optimizer steps/epoch. Returns
    (trace_dir, total optimizer steps) so the report is per-step."""
    import jax

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.parallel import make_mesh
    from midi_vae_tpu.training import VAETrainer
    from midi_vae_tpu.utils.synthetic import synthetic_flat

    cfg = Config(**overrides)
    mesh = make_mesh()
    tr = VAETrainer(cfg, mesh=mesh)
    st = tr.init_state(seed=0)
    n_windows = 16 * cfg.batch_size
    flat = synthetic_flat(cfg, n_songs=64, windows_per_song=n_windows // 64)
    data = tr.prepare_device_data(flat)

    tr.run_epochs_device(st, data, flat.num_windows, epochs, shuffle=True)
    out_dir = tempfile.mkdtemp(prefix="midi_vae_prof_")
    with jax.profiler.trace(out_dir):
        tr.run_epochs_device(st, data, flat.num_windows, epochs, shuffle=True)
    steps_per_epoch = -(-flat.num_windows // cfg.batch_size)
    return out_dir, epochs * steps_per_epoch


def report(trace_dir: str, steps: int, top: int = 25) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        sys.exit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        emeta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                md = emeta.get(ev.metadata_id)
                nm = md.name if md else "?"
                tot[nm] += ev.duration_ps / 1e9
                cnt[nm] += 1
            non_while = sum(t for n, t in tot.items() if not n.startswith("%while"))
            begin = min(ev.offset_ps for ev in line.events)
            end = max(ev.offset_ps + ev.duration_ps for ev in line.events)
            span = (end - begin) / 1e9
            print(f"device-side non-while sum: {non_while / steps:.3f} ms/step")
            print(
                f"device-side trace span:    {span / steps:.3f} ms/step "
                f"(includes other tenants' slices + tracer overhead on the "
                f"shared dev chip -- only meaningful on a quiet chip)"
            )
            for nm, t in tot.most_common(top):
                if nm.startswith("%while"):
                    continue  # outer loop bodies double-count their children
                print(f"  {t / steps * 1000:8.1f}us/step x{cnt[nm]:<6} {nm[:110]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument(
        "--epoch", action="store_true",
        help="profile the production epoch program (run_epochs_device on "
        "the bench.py workload) instead of the bare train step; --steps "
        "is then the number of epochs traced (16 optimizer steps each)",
    )
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()
    from midi_vae_tpu.config import parse_overrides

    overrides = parse_overrides(getattr(args, "set"))
    if args.epoch:
        trace_dir, steps = capture_epoch(args.steps, overrides)
    else:
        trace_dir, steps = capture(args.steps, overrides), args.steps
    try:
        report(trace_dir, steps, args.top)
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root
    main()

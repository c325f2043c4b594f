#!/usr/bin/env python
"""Batch-size / dtype / width utilization study of the training path.

The reference pins batch_size=256 (settings.py:110) -- a parity choice, not
a hardware one; bench.py measures that geometry. This tool measures the
HEADROOM past it: the same fixed-size synthetic dataset trained at global
batch 256 -> 4096, in float32 or bfloat16, at lstm_size 256 or 512,
reporting per config

  * note-steps/s (the framework's headline unit),
  * ANALYTIC matmul FLOPs per optimizer step (tools/flops_model.py --
    XLA's cost_analysis cannot see inside Pallas custom calls, so its
    counts swing 70x with kernel admission; the architecture-derived
    count is the only consistent MFU denominator). The XLA cost model's
    bytes-accessed is still reported -- it tracks the HBM-traffic story.
  * achieved TFLOP/s and % of the v5e-chip bf16 peak (197 TFLOP/s) -- the
    MFU column. f32 runs are reported against the same denominator:
    under XLA's default matmul precision, f32 matmuls ride the MXU's
    one-pass bf16-input path (f32 accumulate), so bf16 peak IS the
    roofline for both dtypes,
  * which decode-head kernel mode each head admits at that geometry
    (inplace / wide / scan -- the VMEM tile models of ops/fused_train.py).

Methodology matches bench.py: whole epochs per device dispatch, and the
configs are INTERLEAVED round-robin with best-of taken per config, so the
shared dev chip's tenant time-slicing (which only ever adds time) cannot
bias the comparison. Wall-clock numbers here are environment-qualified;
the EVAL_REPORT headline configs are re-pinned with device-op traces
(tools/profile_step.py --epoch), the only fully trustworthy timing on the
tunneled chip.

Usage:
    python tools/bench_batch.py [--batches 256,512,1024,2048,4096]
        [--rounds 5] [--steps-per-call 160] [--set KEY=VALUE ...]
        [--out FILE.json]

--set applies Config overrides to every swept batch size, e.g.
    --set compute_dtype=bfloat16 --set lstm_size=512
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# v5e per-chip peak: 197 bf16 TFLOP/s (394 int8). One denominator for the
# whole table; see module docstring.
V5E_BF16_PEAK_TFLOPS = 197.0


def decode_head_modes(cfg) -> dict:
    """Which kernel mode each decode head takes at (B, D, H) under this
    config -- the admission decision of ops/fused_train._dec_mode, queried
    through its own VMEM tile models so the table can't drift from the
    dispatch logic."""
    from midi_vae_tpu.ops import fused_train as ft

    B = cfg.batch_size
    H = cfg.lstm_size
    n = cfg.num_layers_decoder
    heads = {"notes": (cfg.output_dim, n)}
    if cfg.meta_instrument:
        heads["instrument"] = (cfg.instrument_dim, 1)
    if cfg.meta_velocity:
        # narrow heads ride the kernels promoted to f32 (fused_train)
        heads["velocity"] = (1, 1)
    if cfg.meta_held_notes:
        heads["held"] = (2, 1)
    if cfg.meta_next_notes:
        heads["next"] = (cfg.output_dim, n)
    s = 2 if cfg.compute_dtype == "bfloat16" else 4
    out = {}
    for name, (D, nl) in heads.items():
        s_head = 4 if D < 8 else s
        if ft._dec_train_vmem_ok(B, D, H, nl):
            out[name] = "inplace"
        elif ft._dec_wide_btiles(B, D, H, nl, s_head)[0]:
            bt = ft._dec_wide_btiles(B, D, H, nl, s_head)
            out[name] = f"wide(bt={bt[0]}/{bt[1]})"
        else:
            out[name] = "scan"
    return out


def step_cost_analysis(tr, st, cfg) -> dict:
    """XLA cost model of ONE optimizer step at this geometry: flops and
    HBM bytes accessed, from the compiled train_step (the same jit the
    epoch program scans over)."""
    import numpy as np

    from midi_vae_tpu.parallel import shard_batch
    from midi_vae_tpu.parallel.mesh import pad_batch_to
    from midi_vae_tpu.training.trainer import _slice_batch
    from midi_vae_tpu.utils.synthetic import synthetic_flat

    flat = synthetic_flat(cfg, n_songs=8, windows_per_song=-(-cfg.batch_size // 8))
    batch = _slice_batch(flat, np.arange(cfg.batch_size), cfg, None)
    batch, mask = pad_batch_to(batch, cfg.batch_size)
    batch["M"] = mask
    batch = shard_batch(batch, tr.mesh)
    compiled = tr.train_step.lower(st.params, st.opt_state, batch, st.rng).compile()
    ca_list = compiled.cost_analysis()
    ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,512,1024,2048,4096")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument(
        "--steps-per-call", type=int, default=160,
        help="optimizer steps per timed device call (epochs-per-call is "
        "derived per batch size so every config amortizes dispatch "
        "equally)",
    )
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    ap.add_argument("--out", default=None, help="also write the JSON here")
    ap.add_argument("--no-cost", action="store_true",
                    help="skip the per-step cost-model compile (faster)")
    args = ap.parse_args()

    from midi_vae_tpu.config import parse_overrides

    overrides = parse_overrides(getattr(args, "set"))
    if "batch_size" in overrides:
        raise SystemExit("--batches sweeps batch_size; do not --set it")

    from midi_vae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.parallel import make_mesh
    from midi_vae_tpu.training import VAETrainer
    from midi_vae_tpu.utils.synthetic import synthetic_flat

    batches = [int(b) for b in args.batches.split(",")]
    # dataset scales with the largest batch so every config runs whole
    # batches of its own size from the same arrays
    n_windows = max(4096, max(batches))

    runs = []
    for bs in batches:
        cfg = Config(batch_size=bs, **overrides)
        mesh = make_mesh()
        tr = VAETrainer(cfg, mesh=mesh)
        st = tr.init_state(seed=0)
        flat = synthetic_flat(cfg, n_songs=64, windows_per_song=n_windows // 64)
        data = tr.prepare_device_data(flat)
        steps_per_epoch = -(-flat.num_windows // bs)
        epochs = max(1, -(-args.steps_per_call // steps_per_epoch))
        cost = None if args.no_cost else step_cost_analysis(tr, st, cfg)
        from flops_model import train_step_flops

        runs.append({
            "bs": bs, "tr": tr, "st": st, "data": data,
            "nw": flat.num_windows, "epochs": epochs,
            "steps": epochs * steps_per_epoch, "cost": cost,
            "flops": train_step_flops(cfg),
            "modes": decode_head_modes(cfg),
            "out_len": cfg.output_length,
        })
        print(f"built B={bs}: {epochs} epochs/call = "
              f"{epochs * steps_per_epoch} steps, modes={runs[-1]['modes']},"
              f" cost={cost}", file=sys.stderr)

    # compile + warmup every config before any timing
    for r in runs:
        r["tr"].run_epochs_device(r["st"], r["data"], r["nw"], r["epochs"],
                                  shuffle=True)
        print(f"warm B={r['bs']}", file=sys.stderr)

    best = {r["bs"]: float("inf") for r in runs}
    for i in range(args.rounds):
        for r in runs:
            t0 = time.perf_counter()
            per_epoch = r["tr"].run_epochs_device(
                r["st"], r["data"], r["nw"], r["epochs"], shuffle=True
            )
            dt = time.perf_counter() - t0
            assert len(per_epoch) == r["epochs"]
            best[r["bs"]] = min(best[r["bs"]], dt)
        print(f"round {i + 1}/{args.rounds} done", file=sys.stderr)

    per_batch = {}
    for r in runs:
        bs = r["bs"]
        dt = best[bs]
        # note-steps from the ACTUAL config (--set may override geometry)
        note_steps = r["epochs"] * r["nw"] * r["out_len"]
        tflops = r["flops"] * r["steps"] / dt / 1e12
        entry = {
            "note_steps_per_s": round(note_steps / dt, 1),
            "ms_per_step": round(dt / r["steps"] * 1e3, 3),
            "steps_per_call": r["steps"],
            "decode_modes": r["modes"],
            "step_gflop_analytic": round(r["flops"] / 1e9, 2),
            "achieved_tflop_s": round(tflops, 2),
            "pct_v5e_bf16_peak": round(100 * tflops / V5E_BF16_PEAK_TFLOPS, 2),
        }
        if r["cost"]:
            entry.update({
                "step_gflop_xla_cost_model": round(r["cost"]["flops"] / 1e9, 2),
                "step_hbm_gb": round(r["cost"]["bytes_accessed"] / 1e9, 3),
            })
        per_batch[str(bs)] = entry

    out = {
        "metric": "batch_scaling_utilization",
        "overrides": overrides,
        "dataset_windows": n_windows,
        "rounds": args.rounds,
        "peak_denominator_tflops": V5E_BF16_PEAK_TFLOPS,
        "per_batch": per_batch,
    }
    if 256 in batches:
        out["speedup_vs_b256"] = {
            str(bs): round(
                per_batch[str(bs)]["note_steps_per_s"]
                / per_batch["256"]["note_steps_per_s"], 3,
            )
            for bs in batches
        }
    js = json.dumps(out)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root
    sys.exit(main())

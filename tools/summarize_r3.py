#!/usr/bin/env python
"""Summarize the round-3 per-head study runs (/tmp/r3 by default) into a
markdown table: per-head reconstruction quality (notes accuracy, velocity
MSE, held-note accuracy, instrument accuracy) on the std and hard corpora,
train and test splits -- the metric set the reference's test() prints per
epoch (vae_training.py:243-568). Reads only the framework's own artifacts
(history.json)."""

from __future__ import annotations

import json
import os
import sys

COLS = [
    ("notes_acc", "notes acc", "{:.3f}"),
    ("meta_velocity_loss", "velocity MSE", "{:.5f}"),
    ("meta_held_notes_acc", "held acc", "{:.3f}"),
    ("meta_instrument_acc", "instrument acc", "{:.3f}"),
]


def row(run, label):
    with open(os.path.join(run, "history.json")) as f:
        h = json.load(f)
    last, last_test = h["train"][-1], (h["test"][-1] if h["test"] else {})
    cells = [f"{label} ({len(h['train'])} ep)"]
    for key, _, fmt in COLS:
        tr = fmt.format(last[key]) if key in last else "--"
        te = fmt.format(last_test[key]) if key in last_test else "--"
        cells.append(f"{tr} / {te}")
    return "| " + " | ".join(cells) + " |"


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3"
    print("## Per-head reconstruction (train / test)\n")
    print("| run | " + " | ".join(n for _, n, _ in COLS) + " |")
    print("|---|" + "---|" * len(COLS))
    for name, label in [
        ("vae_std_heads", "std corpus"),
        ("vae_hard_heads", "hard corpus"),
    ]:
        run = os.path.join(base, name)
        if os.path.exists(os.path.join(run, "history.json")):
            print(row(run, label))
        else:
            print(f"| {label} | (missing) |")
    return 0


if __name__ == "__main__":
    sys.exit(main())

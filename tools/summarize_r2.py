#!/usr/bin/env python
"""Summarize the round-2 study runs (/tmp/r2 by default) into markdown
tables: f32-vs-bf16 convergence, teacher forcing, big-corpus generalization,
3-class switch matrix. Reads only the framework's own artifacts
(history.json / results.json)."""

from __future__ import annotations

import json
import os
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def train_summary(run):
    h = load(os.path.join(run, "history.json"))
    last = h["train"][-1]
    last_test = h["test"][-1] if h["test"] else {}
    return {
        "epochs": len(h["train"]),
        "train_loss": last.get("loss"),
        "train_notes_acc": last.get("notes_acc"),
        "test_loss": last_test.get("loss"),
        "test_notes_acc": last_test.get("notes_acc"),
    }


def loss_curve(run, every=300):
    h = load(os.path.join(run, "history.json"))
    pts = []
    for e, m in zip(h["epoch"], h["train"]):
        if e % every == 0 or e == h["epoch"][-1]:
            pts.append((e, m.get("loss")))
    return pts


def eval_summary(eval_dir):
    r = load(os.path.join(eval_dir, "results.json"))
    rows = r["autoencoding_metrics"]
    mean = next(row for row in rows if row.get("song_name") == "Mean")
    keys = [
        "pitch_reconstruction_accuracy",
        "original_ensemble_classifier_accuracy",
        "autoencoded_ensemble_classifier_accuracy",
        "switched_ensemble_classifier_accuracy",
        "original_ensemble_classifier_confidence",
        "switched_ensemble_classifier_confidence",
    ]
    out = {k: mean.get(k) for k in keys}
    out["recon_mean"] = r.get("mean_reconstruction_accuracy")
    # per-pair switched columns (3-class runs)
    out["pairs"] = {
        k: v for k, v in mean.items()
        if k.startswith("switched_ensemble_classifier_accuracy_")
    }
    return out


def fmt(x):
    return "—" if x is None else f"{x:.3f}"


def main():
    R = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r2"

    print("## Training summaries\n")
    print("| run | epochs | train loss | train notes acc | test loss | test notes acc |")
    print("|---|---|---|---|---|---|")
    for name in ("vae_f32", "vae_bf16", "vae_tf", "vae_big", "vae_tri", "vae_xl", "vae_xxl"):
        run = os.path.join(R, name)
        if not os.path.exists(os.path.join(run, "history.json")):
            continue
        s = train_summary(run)
        print(
            f"| {name} | {s['epochs']} | {fmt(s['train_loss'])} | "
            f"{fmt(s['train_notes_acc'])} | {fmt(s['test_loss'])} | "
            f"{fmt(s['test_notes_acc'])} |"
        )

    print("\n## f32 vs bf16 loss curves (train loss at epoch)\n")
    for name in ("vae_f32", "vae_bf16"):
        run = os.path.join(R, name)
        if os.path.exists(os.path.join(run, "history.json")):
            pts = loss_curve(run)
            print(f"{name}: " + "  ".join(f"e{e}={fmt(l)}" for e, l in pts))

    print("\n## Evaluation summaries (test set)\n")
    print("| eval | pitch recon | ens orig | ens autoenc | ens switched | conf orig→switched |")
    print("|---|---|---|---|---|---|")
    for name in ("eval_f32", "eval_bf16", "eval_tf", "eval_big", "eval_tri", "eval_xl", "eval_xxl"):
        d = os.path.join(R, name)
        if not os.path.exists(os.path.join(d, "results.json")):
            continue
        s = eval_summary(d)
        print(
            f"| {name} | {fmt(s['recon_mean'])} | "
            f"{fmt(s['original_ensemble_classifier_accuracy'])} | "
            f"{fmt(s['autoencoded_ensemble_classifier_accuracy'])} | "
            f"{fmt(s['switched_ensemble_classifier_accuracy'])} | "
            f"{fmt(s['original_ensemble_classifier_confidence'])}→"
            f"{fmt(s['switched_ensemble_classifier_confidence'])} |"
        )

    tri = os.path.join(R, "eval_tri")
    if os.path.exists(os.path.join(tri, "results.json")):
        s = eval_summary(tri)
        if s["pairs"]:
            print("\n## 3-class per-pair switched ensemble accuracy (0 = fully transferred)\n")
            for k in sorted(s["pairs"]):
                pair = k.rsplit("_", 1)[-1]
                print(f"- {pair}: {fmt(s['pairs'][k])}")


if __name__ == "__main__":
    main()

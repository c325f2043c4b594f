#!/usr/bin/env python
"""One-command release verification.

Re-runs every README "Current state at a glance" claim this machine can
check -- the test tiers, the driver entry points, the headline bench, the
multi-chip compile inventories, and the reference-parity differentials --
and prints a PASS/FAIL table with wall times. Exit code 0 iff everything
passed.

Default set (~10-15 min on this machine):
    python tools/verify_release.py
Add the slow evidence (full suite, real-chip config soak, the executing-
reference model/grads differentials; ~1h):
    python tools/verify_release.py --full
Skip the TPU-touching checks (CPU-only environments):
    python tools/verify_release.py --no-tpu

Each check is also runnable by hand; the command is printed next to its
verdict, so a failure here reproduces directly in a shell.
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable


class Check:
    def __init__(self, name, cmd, timeout=1800, validate=None, env=None):
        self.name = name
        self.cmd = cmd
        self.timeout = timeout
        self.validate = validate  # (stdout) -> error string or None
        self.env = env
        self.measured = ""  # last JSON line of a passing JSON-emitting check

    def run(self) -> tuple[bool, float, str]:
        t0 = time.perf_counter()
        env = dict(os.environ)
        if self.env:
            env.update(self.env)
        try:
            proc = subprocess.run(
                self.cmd, cwd=REPO, env=env, timeout=self.timeout,
                capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            return False, time.perf_counter() - t0, f"timeout {self.timeout}s"
        dt = time.perf_counter() - t0
        if proc.returncode != 0:
            tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
            return False, dt, f"rc={proc.returncode}: " + " | ".join(tail)
        if self.validate is not None:
            # a validator crash (missing JSON, unexpected shape) is a FAIL
            # for THIS check, never an abort of the whole runner
            try:
                err = self.validate(proc.stdout)
            except Exception as e:
                return False, dt, f"validator error: {e!r}"
            if err:
                return False, dt, err
            # surface WHAT was measured, not just that it validated
            try:
                self.measured = json.dumps(last_json(proc.stdout))
            except Exception:
                self.measured = ""
        return True, dt, ""


def last_json(stdout: str) -> dict:
    """The last JSON object printed to stdout (the tools' contract)."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise ValueError("no JSON line in output")


def _bench_ok(stdout: str) -> str | None:
    d = last_json(stdout)
    if d.get("vs_baseline", 0) < 1.0:
        return f"below the 50k target: {d}"
    return None


def _parity_ok(stdout: str) -> str | None:
    d = last_json(stdout)
    if not d.get("ok"):
        return f"differential not ok: {d}"
    # reference-absent environments: ref_parity_check reports
    # {"ok": true, "skipped": ...} with no MISMATCH key -- a skip is not
    # a failure (the measured line shows it was skipped)
    if d.get("MISMATCH", 0) != 0:
        return f"differential mismatch: {d}"
    return None


def _dp8_ok(stdout: str) -> str | None:
    d = last_json(stdout)
    prog = d["programs"]["train_step"]
    if prog["mosaic_kernels"] != 12:
        return f"train_step kernels {prog['mosaic_kernels']} != 12"
    if prog["collectives"]["all-reduce"] != 2:
        return f"train_step all-reduces {prog['collectives']} != 2"
    return None


def _shard_data_ok(stdout: str) -> str | None:
    d = last_json(stdout)
    prog = d["programs"]["chunked_epoch_sharded_data"]
    if prog["mosaic_kernels"] != 12:
        return (
            "sharded-data epoch lost the fused kernels: "
            f"{prog['mosaic_kernels']} != 12"
        )
    return None


def _dryrun_ok(stdout: str) -> str | None:
    if "DRYRUN OK" not in stdout:
        return "missing DRYRUN OK line"
    return None


def _soak_ok(stdout: str) -> str | None:
    if "configs pass on tpu" not in stdout:
        return "missing 'all N configs pass' line"
    return None


def build_checks(args) -> list[Check]:
    checks: list[Check] = []
    # 1. the test tiers
    if args.full:
        checks.append(Check(
            "full suite (tests/, slow tier included)",
            [PY, "-m", "pytest", "tests/", "-q"], timeout=5400,
        ))
    else:
        checks.append(Check(
            "smoke tier (pytest -m 'not slow')",
            [PY, "-m", "pytest", "tests/", "-q", "-m", "not slow", "-x"],
            timeout=1800,
        ))
    # 2. driver entry points (virtual 8-device CPU mesh; includes the
    # interpret-kernels-under-shard_map and 2-process legs)
    checks.append(Check(
        "multichip dryrun (8 virtual devices)",
        [PY, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN OK')"],
        timeout=1200, validate=_dryrun_ok,
    ))
    if not args.no_tpu:
        # 3. the headline bench (>= the 50k note-steps/s/chip target)
        checks.append(Check(
            "bench.py headline (>= 50k target)",
            [PY, "bench.py"], timeout=1200, validate=_bench_ok,
        ))
        # 4. multi-chip compile inventories (real-toolchain AOT, no slice
        # needed): DP=8 train step and the sharded-data overflow epoch
        checks.append(Check(
            "v5e-8 DP=8 train step: 12 Mosaic kernels, 2 all-reduces",
            [PY, "tools/compile_topology.py", "--topology", "v5e:2x4",
             "--mesh", "data=8"], timeout=1200, validate=_dp8_ok,
        ))
        checks.append(Check(
            "v5e-8 sharded-data epoch keeps the 12 fused kernels",
            [PY, "tools/compile_topology.py", "--topology", "v5e:2x4",
             "--mesh", "data=8", "--epoch", "--shard-data"],
            timeout=1200, validate=_shard_data_ok,
        ))
        if args.full:
            checks.append(Check(
                "TPU config-matrix soak (~25 real-chip configs)",
                [PY, "tools/tpu_soak.py", "--epochs", "4"],
                timeout=3600, validate=_soak_ok,
            ))
    # 5. reference-parity differentials vs the executing reference
    fast_surfaces = ["analysis", "render", "batchprep", "sampling", "probes"]
    for s in fast_surfaces:
        checks.append(Check(
            f"parity differential --{s}",
            [PY, "tools/ref_parity_check.py", f"--{s}"],
            timeout=1200, validate=_parity_ok,
        ))
    if args.full:
        for s in ["adversarial", "model", "grads", "kerasio"]:
            checks.append(Check(
                f"parity differential --{s}",
                [PY, "tools/ref_parity_check.py", f"--{s}"],
                timeout=2400, validate=_parity_ok,
            ))
    return checks


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--full", action="store_true",
                    help="add the slow evidence (full suite, TPU soak, "
                         "model/grads differentials)")
    ap.add_argument("--no-tpu", action="store_true",
                    help="skip checks that touch the TPU / its toolchain")
    ap.add_argument("--only", default=None,
                    help="substring filter on check names")
    args = ap.parse_args()

    checks = build_checks(args)
    if args.only:
        checks = [c for c in checks if args.only.lower() in c.name.lower()]
        if not checks:
            print(f"no checks match --only {args.only!r}")
            return 2

    results = []
    for c in checks:
        print(f"[ RUN  ] {c.name}", flush=True)
        ok, dt, err = c.run()
        results.append((c, ok, dt, err))
        verdict = "PASS" if ok else "FAIL"
        print(f"[ {verdict} ] {c.name} ({dt:.0f}s)"
              + (f" -- {err}" if err else ""), flush=True)

    print("\n=== release verification summary ===")
    failed = 0
    for c, ok, dt, err in results:
        mark = "PASS" if ok else "FAIL"
        print(f"  {mark}  {dt:7.1f}s  {c.name}")
        print(f"        $ {shlex.join(c.cmd)}")
        if c.measured:
            print(f"        {c.measured}")
        if err:
            print(f"        {err}")
        failed += 0 if ok else 1
    total = sum(dt for _, _, dt, _ in results)
    print(f"\n{len(results) - failed}/{len(results)} checks passed "
          f"in {total / 60:.1f} min")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

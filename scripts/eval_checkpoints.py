#!/usr/bin/env python3
"""Evaluate every trained final checkpoint with play.py (VERDICT r2 #6).

For each ``checkpoints/DirGate_*/poca_final`` (or explicit dirs), runs the
eval entry twice — stochastic and deterministic — and prints one summary
table (markdown) of mean/std/min/max/median returns, mirroring the
reference's play.py stats print (/root/reference/scripts/play.py:215-223).
Evaluation runs fine on CPU (JAX_PLATFORMS=cpu) while the chip trains.

Usage:
    python scripts/eval_checkpoints.py [--episodes 10] [ckpt_dir ...]
"""

from __future__ import annotations

import argparse
import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def run_eval(ckpt: pathlib.Path, episodes: int, deterministic: bool,
             seed: int) -> dict | None:
    # evaluation runs on CPU so it never contends with a chip that is
    # training (JAX_PLATFORMS is ignored on tunnel hosts; --platform
    # works — .claude/skills/verify)
    cmd = [sys.executable, str(ROOT / "scripts" / "play.py"),
           "--platform", "cpu",
           "--checkpoint", str(ckpt), "--num_episodes", str(episodes),
           "--seed", str(seed)]
    if deterministic:
        cmd.append("--deterministic")
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3600)
    except subprocess.TimeoutExpired:
        # one hung eval must not discard the rows already collected
        print(f"[eval] {ckpt} timed out after 3600s, skipping",
              file=sys.stderr)
        return None
    if out.returncode != 0:
        print(f"[eval] {ckpt} FAILED:\n{out.stderr[-2000:]}",
              file=sys.stderr)
        return None
    stats = {}
    for key in ("mean", "std", "min", "max", "median"):
        m = re.search(rf"^\s*{key}\s*:\s*(-?[\d.]+)", out.stdout, re.M)
        if m:
            stats[key] = float(m.group(1))
    return stats or None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="*",
                    help="checkpoint run dirs (default: checkpoints/DirGate_*)")
    ap.add_argument("--episodes", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    dirs = ([pathlib.Path(d) for d in args.dirs] or
            sorted((ROOT / "checkpoints").glob("DirGate_*")))
    rows = []
    for d in dirs:
        final = d / "poca_final" if (d / "poca_final").is_dir() else d
        if not (final / "metadata.json").exists():
            print(f"[eval] {d}: no final checkpoint, skipping",
                  file=sys.stderr)
            continue
        for det in (False, True):
            s = run_eval(final, args.episodes, det, args.seed)
            if s:
                rows.append((d.name, "det" if det else "stoch", s))
                print(f"[eval] {d.name} ({'det' if det else 'stoch'}): "
                      f"mean {s['mean']:.2f} ± {s['std']:.2f}", flush=True)

    print("\n| run | mode | mean | std | min | max | median |")
    print("|---|---|---|---|---|---|---|")
    for name, mode, s in rows:
        print(f"| {name} | {mode} | {s['mean']:.2f} | {s['std']:.2f} | "
              f"{s['min']:.2f} | {s['max']:.2f} | {s['median']:.2f} |")


if __name__ == "__main__":
    main()

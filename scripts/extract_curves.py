#!/usr/bin/env python3
"""Extract learning curves from TensorBoard runs to CSV.

Used to build the validation artifacts in docs/validation/ (the matrix
summaries in VALIDATION.md): reads `runs/<run>/events.*` and writes
`docs/validation/<run>__<tag>.csv` with (step, value) rows.

Usage:
    python scripts/extract_curves.py runs/DirGate_lily_seed1 [...runs]
        [--tag "Extra/Group Reward Mean"] [--out docs/validation]
"""

from __future__ import annotations

import argparse
import csv
import pathlib
import sys

from tensorboard.backend.event_processing.event_accumulator import (
    EventAccumulator,
)


def extract(run_dir: pathlib.Path, tag: str, wall_time: bool = False):
    acc = EventAccumulator(str(run_dir), size_guidance={"scalars": 0})
    acc.Reload()
    if tag not in acc.Tags().get("scalars", []):
        return None
    if wall_time:
        # minutes since the run's first event — makes steps-to-level
        # directly quotable in wall-clock terms (VERDICT r2 #4)
        t0 = acc.Scalars(tag)[0].wall_time
        return [(e.step, round((e.wall_time - t0) / 60, 2), e.value)
                for e in acc.Scalars(tag)]
    return [(e.step, e.value) for e in acc.Scalars(tag)]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+")
    p.add_argument("--tag", default="Extra/Group Reward Mean")
    p.add_argument("--out", default="docs/validation")
    p.add_argument("--wall-time", action="store_true",
                   help="add a minutes-since-start column")
    args = p.parse_args(argv)

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    slug = args.tag.replace("/", "_").replace(" ", "_").lower()
    rc = 0
    for run in args.runs:
        run_dir = pathlib.Path(run)
        rows = extract(run_dir, args.tag, wall_time=args.wall_time)
        if not rows:  # None (tag absent) or registered-but-empty scalars
            print(f"[extract] {run}: no data for tag {args.tag!r}",
                  file=sys.stderr)
            rc = 1
            continue
        out = out_dir / f"{run_dir.name}__{slug}.csv"
        with open(out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["step", "minutes", "value"] if args.wall_time
                       else ["step", "value"])
            w.writerows(rows)
        print(f"[extract] {run} → {out} ({len(rows)} points, "
              f"final {rows[-1][-1]:.2f})")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

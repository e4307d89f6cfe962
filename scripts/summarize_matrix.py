#!/usr/bin/env python3
"""Summarize the multi-seed validation matrix for VALIDATION.md.

For each run dir given (or every `runs/DirGate_*_seed*` plus the round-1
`runs/full_*`), reads the `Extra/Group Reward Mean` curve and reports the
final value and the mean of the last 10% of points; then aggregates
mean ± range per variant across seeds.

Usage: python scripts/summarize_matrix.py [runs ...]
"""

from __future__ import annotations

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from extract_curves import extract  # noqa: E402

TAG = "Extra/Group Reward Mean"


def tail_mean(rows, frac=0.1):
    k = max(1, int(len(rows) * frac))
    vals = [v for _, v in rows[-k:]]
    return sum(vals) / len(vals)


def main(argv=None):
    args = (argv or sys.argv[1:])
    root = pathlib.Path("runs")
    runs = [pathlib.Path(r) for r in args] or sorted(
        list(root.glob("DirGate_*_seed*")) + list(root.glob("full_*")))
    per_variant: dict[str, list[tuple[str, float, float]]] = {}
    for run in runs:
        rows = extract(run, TAG)
        if not rows:
            print(f"[matrix] {run.name}: no curve", file=sys.stderr)
            continue
        m = re.match(r"(?:DirGate_|full_)(\w+?)(?:_bf16)?(?:_seed(\d+))?$",
                     run.name)
        if not m:
            continue
        variant = m.group(1) + ("_bf16" if "_bf16" in run.name else "")
        seed = m.group(2) or "0"
        final, tm = rows[-1][1], tail_mean(rows)
        per_variant.setdefault(variant, []).append((seed, final, tm))
        print(f"{run.name:32s} points={len(rows):4d} final={final:7.2f} "
              f"tail10%={tm:7.2f}")

    print("\nvariant aggregate (tail-10% mean of Group Reward Mean):")
    for variant, entries in sorted(per_variant.items()):
        tms = [tm for _, _, tm in entries]
        lo, hi = min(tms), max(tms)
        mean = sum(tms) / len(tms)
        seeds = ",".join(s for s, _, _ in sorted(entries))
        print(f"  {variant:16s} seeds[{seeds}]  mean {mean:7.2f}  "
              f"range [{lo:.2f}, {hi:.2f}]  spread {hi-lo:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

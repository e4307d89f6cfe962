#!/usr/bin/env python3
"""Summarize the multi-seed validation matrix for VALIDATION.md.

For each run dir given (or every `runs/DirGate_*_seed*` plus the round-1
`runs/full_*`), reads the `Extra/Group Reward Mean` curve and reports the
final value and the mean of the last 10% of points; then aggregates
mean ± range per variant across seeds. For the bimodal variants the
aggregate additionally reports the escape rate — the fraction of seeds
that leave the ~3 plateau for the shuttling strategy — since that (not a
mean over modes) is the comparable cross-framework statistic (mirrors
the reference's 10-seed SLURM-array run unit,
/root/reference/scripts/hpc/train_*.slurm).

With --csv, reads the committed curve CSVs in docs/validation/ instead
of TensorBoard run dirs — works on a fresh host where runs/ is empty.

Usage: python scripts/summarize_matrix.py [runs ...]
       python scripts/summarize_matrix.py --csv [docs/validation]
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


# Tail-10% mean above this = the seed escaped into the shuttling
# strategy; below = stuck on the ~3 plateau. The gap between modes is
# ~10 units wide on every observed seed, so the exact cut is uncritical.
ESCAPE_THRESHOLD = 10.0


def _read_csv_curves(csv_dir: pathlib.Path):
    """Yield (run_name, rows) from the committed docs/validation CSVs.

    Seed-0 curves live in the round-1 `full_<variant>_group_reward.csv`
    files; later seeds in `DirGate_<variant>_seed<k>__<tag>.csv`.
    """
    import csv as _csv

    for f in sorted(csv_dir.glob("*.csv")):
        name = None
        if f.name.endswith("__extra_group_reward_mean.csv"):
            name = f.name.split("__")[0]
        elif (m := re.match(r"full_(\w+)_group_reward\.csv$", f.name)):
            name = f"DirGate_{m.group(1)}_seed0"
        if name is None:
            continue
        with f.open() as fh:
            data = list(_csv.reader(fh))[1:]  # skip header
        yield name, [(int(r[0]), float(r[-1])) for r in data]


def main(argv=None):
    args = list(argv or sys.argv[1:])
    curves = []
    if "--csv" in args:
        args.remove("--csv")
        csv_dir = pathlib.Path(args[0] if args else "docs/validation")
        curves = list(_read_csv_curves(csv_dir))
    else:
        root = pathlib.Path("runs")
        runs = [pathlib.Path(r) for r in args] or sorted(
            list(root.glob("DirGate_*_seed*")) + list(root.glob("full_*")))
        for run in runs:
            rows = extract(run, TAG)
            if not rows:
                print(f"[matrix] {run.name}: no curve", file=sys.stderr)
                continue
            curves.append((run.name, rows))

    per_variant: dict[str, list[tuple[str, float, float]]] = {}
    for name, rows in curves:
        m = re.match(r"(?:DirGate_|full_)(\w+?)(?:_(bf16|ft))?(?:_seed(\d+))?$",
                     name)
        if not m:
            continue
        variant = m.group(1) + (f"_{m.group(2)}" if m.group(2) else "")
        seed = m.group(3) or "0"
        final, tm = rows[-1][1], tail_mean(rows)
        per_variant.setdefault(variant, []).append((seed, final, tm))
        print(f"{name:32s} points={len(rows):4d} final={final:7.2f} "
              f"tail10%={tm:7.2f}")

    print("\nvariant aggregate (tail-10% mean of Group Reward Mean):")
    for variant, entries in sorted(per_variant.items()):
        tms = [tm for _, _, tm in entries]
        lo, hi = min(tms), max(tms)
        mean = sum(tms) / len(tms)
        seeds = ",".join(s for s, _, _ in sorted(entries, key=lambda e: int(e[0])))
        line = (f"  {variant:16s} seeds[{seeds}]  mean {mean:7.2f}  "
                f"range [{lo:.2f}, {hi:.2f}]  spread {hi-lo:.2f}")
        escaped = [t for t in tms if t >= ESCAPE_THRESHOLD]
        if escaped and len(escaped) < len(tms):  # bimodal: report per mode
            stuck = [t for t in tms if t < ESCAPE_THRESHOLD]
            line += (f"\n  {'':16s} bimodal: escape rate "
                     f"{len(escaped)}/{len(tms)}, escaped mode mean "
                     f"{sum(escaped)/len(escaped):.2f} "
                     f"[{min(escaped):.2f}, {max(escaped):.2f}], plateau "
                     f"{sum(stuck)/len(stuck):.2f}")
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

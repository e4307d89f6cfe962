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

# Steps-to-level thresholds (VERDICT r2 #4 — the north star's primary
# learning metric is "steps to a reference reward level"). For the stable
# variants the level is the round number just under every seed's band
# (lily band [33.5, 36.5] → 30; cyclamen [27.8, 32.1] → 25; dandelion
# [2.83, 3.02] → 2.5); for the bimodal variants the meaningful event is
# the ESCAPE itself, so the level is the inter-mode gap (=ESCAPE_THRESHOLD)
# and the statistic is reported over escaped seeds only.
LEVELS = {
    "dandelion": 2.5,
    "lily": 30.0,
    "cyclamen": 25.0,
    "tulip": ESCAPE_THRESHOLD,
    "daisy": ESCAPE_THRESHOLD,
}

# Measured end-to-end training throughput (agent-decisions/s) per variant
# at the validation operating point (E=16, one v5e chip, Pallas kernels +
# fused tail on — VALIDATION.md "Throughput during these runs"). Used to
# convert steps-to-level into wall-clock minutes; the committed CSVs
# predate wall_time columns so this is the anchored conversion.
MEASURED_SPS = {
    "dandelion": 60_000.0,
    "daisy": 55_000.0,
    "lily": 66_000.0,
    "tulip": 95_000.0,
    "cyclamen": 95_000.0,
}


def steps_to_level(rows, level, window=5):
    """First logged step where the rolling mean over a FULL `window` of
    summary points reaches `level`; None if never. Partial windows at
    the curve start are skipped — a single early noisy summary point
    must not count as the level being reached (curves are noisiest
    there)."""
    vals = [v for _, v in rows]
    window = min(window, len(vals))
    for i in range(window - 1, len(rows)):
        if sum(vals[i - window + 1:i + 1]) / window >= level:
            return rows[i][0]
    return None


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
        # 3-column CSVs (extract_curves --wall-time) carry measured
        # minutes-since-start; legacy 2-column ones don't
        rows = [(int(r[0]), float(r[-1])) for r in data]
        wall = ({int(r[0]): float(r[1]) for r in data}
                if data and len(data[0]) == 3 else None)
        yield name, rows, wall


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
            rows3 = extract(run, TAG, wall_time=True)
            if not rows3:
                print(f"[matrix] {run.name}: no curve", file=sys.stderr)
                continue
            curves.append((run.name, [(s, v) for s, _, v in rows3],
                           {s: m for s, m, _ in rows3}))

    per_variant: dict[str, list[tuple[str, float, float]]] = {}
    curves_by_variant: dict[str, list[tuple[str, list]]] = {}
    wall_by_name: dict[str, dict | None] = {}
    for name, rows, wall in curves:
        wall_by_name[name] = wall
        m = re.match(r"(?:DirGate_|full_)(\w+?)(?:_(bf16|ft|mp|E\d+))?"
                     r"(?:_seed(\d+))?$", name)
        if not m:
            continue
        variant = m.group(1) + (f"_{m.group(2)}" if m.group(2) else "")
        seed = m.group(3) or "0"
        final, tm = rows[-1][1], tail_mean(rows)
        per_variant.setdefault(variant, []).append((seed, final, tm))
        curves_by_variant.setdefault(variant, []).append((name, rows))
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
            n, k = len(tms), len(escaped)
            p = k / n
            # Wilson 95% CI on the escape rate (binomial, the right
            # uncertainty for a 10-seed unit)
            z = 1.96
            denom = 1 + z * z / n
            centre = (p + z * z / (2 * n)) / denom
            hw = z * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5) / denom
            line += (f"\n  {'':16s} bimodal: escape rate {k}/{n} "
                     f"(95% CI [{max(0, centre - hw):.2f}, "
                     f"{min(1, centre + hw):.2f}]), escaped mode mean "
                     f"{sum(escaped)/len(escaped):.2f} "
                     f"[{min(escaped):.2f}, {max(escaped):.2f}], plateau "
                     f"{sum(stuck)/len(stuck):.2f}")
        print(line)

    print("\nsteps-to-level (first summary point whose 5-point rolling "
          "mean reaches the variant's level; minutes measured from the "
          "run's own event wall times where available, else at the "
          "anchored per-variant SPS):")
    for variant, entries in sorted(curves_by_variant.items()):
        base = variant.split("_")[0]
        level = LEVELS.get(base)
        if level is None:
            continue
        hits = []
        for name, rows in entries:
            s = steps_to_level(rows, level)
            if s is not None:
                hits.append((name, s))
        if not hits:
            print(f"  {variant:16s} level {level:5.1f}: never reached")
            continue
        hits.sort(key=lambda t: t[1])
        med_name, median = hits[len(hits) // 2]
        per_seed = ", ".join(f"{n.rsplit('seed', 1)[-1]}:{s/1e6:.1f}M"
                             for n, s in hits)
        # measured minutes: the MEDIAN-STEPS run's own TB wall time at
        # its crossing point (excludes only the pre-first-summary
        # compile, ~1.5 min) — same run for both halves of the
        # "median X M decisions = Y min" statistic, not two independent
        # medians that could come from different seeds
        med_wall = (wall_by_name.get(med_name) or {}).get(median)
        if med_wall is not None:
            mins = (f" = {med_wall:.1f} min (measured, "
                    f"seed {med_name.rsplit('seed', 1)[-1]})")
        else:
            # fall back for legacy 2-column CSVs; only for untagged runs —
            # ablation tags (mp, E64, …) train at different throughputs
            sps = MEASURED_SPS.get(base) if variant == base else None
            mins = f" = {median / sps / 60:.1f} min" if sps else ""
        print(f"  {variant:16s} level {level:5.1f}: reached by "
              f"{len(hits)}/{len(entries)} seeds, median "
              f"{median/1e6:.1f}M decisions{mins}  (per seed: {per_seed})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

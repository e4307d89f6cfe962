#!/usr/bin/env python3
"""Render the seed-matrix learning curves as one small-multiples figure.

Reads the committed curve CSVs in docs/validation/ (the same files
summarize_matrix.py --csv consumes) and writes
docs/validation/matrix.png: one panel per CASA variant, every f32 seed
as a thin line in one hue (seeds are repetitions of the same entity,
not identities — one color, direct panel labels, no per-seed legend
entries), numerics-mode overlays (bf16 matmul-operand runs) in the
second categorical hue. Usage:

    python scripts/plot_matrix.py [--csv docs/validation] [--out PATH]
"""

from __future__ import annotations

import argparse
import csv
import pathlib
import re
import sys

VARIANTS = ["dandelion", "daisy", "lily", "tulip", "cyclamen"]
SUBTITLE = {
    "dandelion": "24-obs · continuous · MLP 512×2",
    "daisy": "24-obs · discrete · MLP 512×2",
    "lily": "4-obs · discrete · MLP 512×2",
    "tulip": "4-obs · discrete · MLP 128×1",
    "cyclamen": "4-obs · discrete · LSTM 128",
}
# categorical slots 1-2 of the skill-validated reference palette
C_F32, C_MP = "#2a78d6", "#eb6834"
SURFACE, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"


def load_curves(csv_dir: pathlib.Path):
    """{variant: {"f32": [(name, steps, vals)...], "mp": [...]}} —
    E-ablation tags (E64, E256) are training-dynamics ablations, not
    numerics overlays; they are skipped here to keep the panels about
    the validated operating point."""
    out = {v: {"f32": [], "mp": []} for v in VARIANTS}
    for f in sorted(csv_dir.glob("*.csv")):
        if f.name.endswith("__extra_group_reward_mean.csv"):
            name = f.name.split("__")[0]
        elif (m := re.match(r"full_(\w+)_group_reward\.csv$", f.name)):
            name = f"DirGate_{m.group(1)}_seed0"
        else:
            continue
        m = re.match(
            r"DirGate_(\w+?)(?:_(bf16|ft|mp|mpqk|mpvo|mpqkvo|sp|E\d+))?"
            r"_seed(\d+)$", name)
        if not m or m.group(1) not in out:
            continue
        tag = m.group(2)
        if tag in ("bf16", "ft") or (tag and tag.startswith("E")):
            continue  # r2 tile-path bf16 / fused-tail / E ablations
        with f.open() as fh:
            rows = list(csv.reader(fh))[1:]
        steps = [int(r[0]) / 1e6 for r in rows]
        vals = [float(r[-1]) for r in rows]
        # sp = seed-parallel lanes of the same f32 configuration (the
        # 10-lane run unit); mp* = bf16-operand overlays incl. the
        # per-stage bisection placements
        cls = "mp" if tag in ("mp", "mpqk", "mpvo", "mpqkvo") else "f32"
        out[m.group(1)][cls].append((f"seed {m.group(3)}", steps, vals))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default="docs/validation")
    p.add_argument("--out", default="docs/validation/matrix.png")
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    curves = load_curves(pathlib.Path(args.csv))
    fig, axes = plt.subplots(1, 5, figsize=(16, 3.1), sharex=True,
                             sharey=True, facecolor=SURFACE)
    for ax, variant in zip(axes, VARIANTS):
        ax.set_facecolor(SURFACE)
        for name, steps, vals in curves[variant]["f32"]:
            ax.plot(steps, vals, color=C_F32, lw=1.0, alpha=0.65)
        for name, steps, vals in curves[variant]["mp"]:
            ax.plot(steps, vals, color=C_MP, lw=1.4, alpha=0.9)
        n32, nmp = len(curves[variant]["f32"]), len(curves[variant]["mp"])
        ax.set_title(f"{variant}  ·  {n32} seeds", fontsize=11,
                     color=INK, pad=10)
        ax.text(0.5, 1.005, SUBTITLE[variant], transform=ax.transAxes,
                ha="center", va="bottom", fontsize=7.5, color=INK2)
        ax.spines[["top", "right"]].set_visible(False)
        ax.spines[["left", "bottom"]].set_color(INK2)
        ax.tick_params(colors=INK2, labelsize=8)
        ax.grid(axis="y", color=INK2, alpha=0.15, lw=0.5)
        ax.set_xlabel("agent-decisions (M)", fontsize=8.5, color=INK2)
        if nmp:
            ax.plot([], [], color=C_MP, lw=1.4, label="bf16 matmul ops")
            ax.plot([], [], color=C_F32, lw=1.0, label="f32")
            ax.legend(fontsize=7.5, frameon=False, loc="upper left",
                      labelcolor=INK2)
    axes[0].set_ylabel("Group Reward Mean", fontsize=8.5, color=INK2)
    fig.suptitle(
        "Full 120 M-decision budget per seed — Extra/Group Reward Mean "
        "(completed-episode team reward)", fontsize=11, color=INK, y=1.10)
    fig.tight_layout()
    out = pathlib.Path(args.out)
    fig.savefig(out, dpi=160, bbox_inches="tight", facecolor=SURFACE)
    print(f"[plot] {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

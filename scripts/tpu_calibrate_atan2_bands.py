#!/usr/bin/env python3
"""Measure the f32-atan2 rounding bands the fused env-step kernel must
replicate (ops/fused_step.py).

The jnp env path makes two angle-threshold decisions through f32 atan2:

  1. obstacle-in-front:  |atan2(sy, sx)| <= pi/2   (env/behaviors.py:100)
  2. wheel hemisphere:   [0,2pi)-shifted atan2(vy, vx) < pi
                                                   (env/behaviors.py:83-86)

On TPU, XLA's atan2 near the quadrant boundaries evaluates
f32(pi/2)/f32(pi) minus a small atan term, so each comparison admits a
half-ULP sliver of the "wrong" side. The fused kernel (which has no
atan2 — Mosaic does not lower it) replicates decision (1) with an exact
band predicate calibrated by this script; decision (2) only affects
float wheel speeds and is left as the exact hemisphere test (see the
kernel docstring's numerics-mode contract).

Run on the real chip:  python scripts/tpu_calibrate_atan2_bands.py
Expected: band (1) transitions at ratio -2^-24 = -5.9604645e-8 and is
scale-invariant; band (2) prints its measured transition for reference.
"""

from __future__ import annotations

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def bracket(pred, ratios, scale):
    xs = jnp.asarray((ratios * scale).astype(np.float32))
    p = np.asarray(pred(jnp.full_like(xs, scale), xs))
    f = ratios[~p]
    t = ratios[p]
    lo = f.max() if len(f) else float("nan")
    hi = t.min() if len(t) else float("nan")
    mono = np.all(np.diff(p.astype(int)) >= 0)
    return lo, hi, mono


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    @jax.jit
    def obstacle(sy, sx):
        return jnp.abs(jnp.arctan2(sy, sx)) <= (math.pi * 0.5)

    @jax.jit
    def front(vx_neg, vy):
        # vy is the swept variable here: vx fixed negative, vy = ratio*|vx|
        a = jnp.arctan2(vy, -vx_neg)
        a = jnp.where(a < 0, a + 2.0 * math.pi, a)
        return a < math.pi

    print("— band 1: |atan2(sy,sx)| <= pi/2 accepts sx/|sy| down to —")
    ratios = np.linspace(-8e-8, -4e-8, 161)
    for sy in (0.01, 0.11, 0.73, 2.3):
        lo, hi, mono = bracket(obstacle, ratios, sy)
        print(f"  |sy|={sy}: last-reject={lo:.4e} first-accept={hi:.4e} "
              f"monotone={mono}  (kernel band: -2^-24 = {-2.0**-24:.4e})")

    # exact-boundary + ULP bracket (the linspace above never samples the
    # representable boundary sx = -2^-24*|sy|, which is what pins the
    # kernel's strict '>'): ops/fused_step.check_atan2_band asserts the
    # measured structure — boundary rejects, first accept at b+[0,2] ULPs
    from swarmacb_tpu.ops.fused_step import check_atan2_band

    print("— band 1 exact-boundary ULP offsets (b = -2^-24*|sy|) —")
    print(f"  first-accept at b+k ULPs: {check_atan2_band()}")

    print("— band 2: [0,2pi) atan2 front test rejects vy/|vx| up to —")
    ratios = np.linspace(0.0, 3e-7, 181)
    for vx in (0.01, 0.11, 0.73, 2.3):
        xs = jnp.asarray((ratios * vx).astype(np.float32))
        p = np.asarray(front(jnp.full_like(xs, vx), xs))
        rej = ratios[~p]
        acc = ratios[p]
        lo = rej.max() if len(rej) else float("nan")
        hi = acc.min() if len(acc) else float("nan")
        print(f"  |vx|={vx}: last-reject={lo:.4e} first-accept={hi:.4e} "
              f"(exact test flips at 0; half-ULP(pi) = 2^-23 = {2.0**-23:.4e})")


if __name__ == "__main__":
    main()

"""TPU↔CPU stepper drift (SURVEY §7 hard-part #1, VERDICT r1 #5).

The golden/parity suite pins the CPU backend bit-level; this test pins
how far the TPU backend may drift from it over a FULL 1200-step episode
(different fp contraction order on MXU/VPU, plus the Pallas kernel path).
Measured numbers and the tolerance rationale live in PARITY.md.

Gated: needs a real TPU in the same process, and each trajectory compile
takes minutes over a tunnelled device — run explicitly with

    SWARMACB_TPU_DRIFT=1 python -m pytest tests/test_tpu_drift.py -q

(scripts/tpu/measure_drift.py is the standalone form of the same check).
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]

# Tolerances, from the measured drift in PARITY.md with ~10× headroom:
# positions live in a ±1.28 m arena; yaw wraps at π. Reward is DISCRETE
# (colour-transition counts), so a near-boundary crossing can differ by
# ±1 on a step; agreement must stay ≳99%.
MAX_POS_DRIFT_M = 0.05
MAX_YAW_DRIFT_RAD = 0.5
MIN_REWARD_AGREEMENT = 0.99


@pytest.mark.skipif(os.environ.get("SWARMACB_TPU_DRIFT") != "1",
                    reason="TPU drift run is explicit (SWARMACB_TPU_DRIFT=1)")
def test_tpu_drift_within_tolerance():
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "tpu" / "measure_drift.py")],
        capture_output=True, text=True, timeout=3000, cwd=ROOT,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    data = json.loads(proc.stdout.strip().splitlines()[-1])
    assert "error" not in data, data
    for case, m in data.items():
        assert m["max_pos_drift_m"] <= MAX_POS_DRIFT_M, (case, m)
        assert m["max_yaw_drift_rad"] <= MAX_YAW_DRIFT_RAD, (case, m)
        assert m["reward_step_agreement"] >= MIN_REWARD_AGREEMENT, (case, m)

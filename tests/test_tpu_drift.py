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

# Tolerances from the measured drift in PARITY.md (with headroom).
# Full-episode positional identity is NOT the criterion for the discrete
# variants: their avoidance state machines amplify ulp-level fp
# differences chaotically (measured onset ≈ step 571 of 1200) — so the
# pinned quantities are short-horizon drift, divergence onset, and
# aggregate reward agreement (measured: 1.5e-6 m @100 steps, 99.92%
# per-step agreement, episode reward sums identical).
MAX_POS_DRIFT_100_M = 1e-4
MIN_DIVERGENCE_ONSET_STEP = 200
MIN_REWARD_AGREEMENT = 0.99
MAX_EPISODE_REWARD_SUM_DIFF = 2.0


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
        assert m["pos_drift_100_steps_m"] <= MAX_POS_DRIFT_100_M, (case, m)
        assert m["divergence_onset_step"] >= MIN_DIVERGENCE_ONSET_STEP, (case, m)
        assert m["reward_step_agreement"] >= MIN_REWARD_AGREEMENT, (case, m)
        assert m["episode_reward_sum_diff"] <= MAX_EPISODE_REWARD_SUM_DIFF, (case, m)

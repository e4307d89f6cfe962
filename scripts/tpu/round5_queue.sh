#!/usr/bin/env bash
# Round-5 TPU queue — seed-parallel matrix completion + measurements.
#
# Runs AFTER the standalone 10-seed dandelion seed-parallel job, cheap
# and high-value first in case the round ends early:
#  1) lily/cyclamen seeds 8-9 via 2-lane seed-parallel runs (completes
#     the stable variants to the reference's exact 10-seed unit,
#     VERDICT r4 missing #2);
#  2) tulip/daisy mixed-precision overlays (VERDICT r4 #5) at the
#     mp_stages placement the `auto` map would pick (qkvo);
#  3) short measurement batch: trainer-rollout fused-env-step SPS/compile
#     (VERDICT r4 #2), bench compile-time reconciliation fused vs
#     composed in FRESH processes (VERDICT r4 #3), fused-step on-HW
#     validator (now includes the atan2 band guard);
#  4) daisy 10-seed seed-parallel unit at full budget — the measured
#     escape wall time (VERDICT r4 missing #3) + second bimodal unit.
#
# Resilience: same health-probe-and-wait pattern as queue_runner.sh;
# every training job resumes via --checkpoint latest.
set -uo pipefail

ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
LOG="${LOG:-/tmp/round5_queue.log}"
note() { echo "[r5queue] $* ($(date))" >> "$LOG"; }

probe() {
  timeout 60 python3 -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
x = jnp.ones((128, 128)); (x @ x).block_until_ready()
" >/dev/null 2>&1
}

wait_healthy() {
  for _ in $(seq 1 120); do
    if probe; then return 0; fi
    note "TPU unhealthy, waiting"
    sleep 120
  done
  note "TPU never recovered; aborting"
  exit 1
}

run_step() {  # run_step <tag> <timeout_s> <cmd...>
  local tag=$1 tmo=$2; shift 2
  local attempt=1
  while [ "$attempt" -le 3 ]; do
    wait_healthy
    note "$tag attempt $attempt"
    timeout "$tmo" "$@" < /dev/null >> "/tmp/r5_${tag}.log" 2>&1
    local rc=$?
    if [ "$rc" -eq 0 ]; then note "$tag DONE"; return 0; fi
    note "$tag rc=$rc (attempt $attempt)"
    attempt=$((attempt + 1))
    sleep 60
  done
  note "$tag FAILED"
  return 1
}

cd "$ROOT"
note "round-5 queue start"

# ── 1) complete lily/cyclamen to the 10-seed unit (cheap, closes
#       VERDICT missing #2 — runs first in case the round ends early) ─
run_step lily_89 7200 python3 scripts/train.py \
  --config configs/DirGate_lily.yaml --num_envs 16 --seeds 8-9 \
  --log_dir runs/DirGate_lily --checkpoint_dir checkpoints/DirGate_lily \
  --checkpoint_interval 12000000 --checkpoint latest
run_step cyclamen_89 7200 python3 scripts/train.py \
  --config configs/DirGate_cyclamen.yaml --num_envs 16 --seeds 8-9 \
  --log_dir runs/DirGate_cyclamen --checkpoint_dir checkpoints/DirGate_cyclamen \
  --checkpoint_interval 12000000 --checkpoint latest

# ── 2) mixed-precision overlays for tulip/daisy (auto-map stages) ─
run_step tulip_mp 7200 python3 scripts/train.py \
  --config configs/DirGate_tulip.yaml --num_envs 16 --seed 1 \
  --mixed_precision --mp_stages qkvo \
  --log_dir runs/DirGate_tulip_mpqkvo_seed1 \
  --checkpoint_dir checkpoints/DirGate_tulip_mpqkvo_seed1 --checkpoint latest
run_step daisy_mp 7200 python3 scripts/train.py \
  --config configs/DirGate_daisy.yaml --num_envs 16 --seed 1 \
  --mixed_precision --mp_stages qkvo \
  --log_dir runs/DirGate_daisy_mpqkvo_seed1 \
  --checkpoint_dir checkpoints/DirGate_daisy_mpqkvo_seed1 --checkpoint latest

# ── 3) measurements ───────────────────────────────────────────────
run_step sweep_lanes_on 2400 python3 scripts/sps_sweep.py \
  --variant daisy --envs 16 --iters 3 --no-phase-split --fused_env_step on
run_step sweep_lanes_off 2400 python3 scripts/sps_sweep.py \
  --variant daisy --envs 16 --iters 3 --no-phase-split --fused_env_step off
run_step validate_fused 1200 python3 scripts/tpu_validate_fused_step.py
run_step bench_fused 3600 python3 bench.py
run_step bench_classic 3600 python3 bench.py --classic

# ── 4) daisy 10-seed seed-parallel unit (full 120 M budget; the
#       longest job, so it runs last) ─────────────────────────────────
run_step daisy_sp 14400 python3 scripts/train.py \
  --config configs/DirGate_daisy.yaml --num_envs 16 --seeds 0-9 \
  --log_dir runs/DirGate_daisy_sp --checkpoint_dir checkpoints/DirGate_daisy_sp \
  --checkpoint_interval 12000000 --checkpoint latest

note "round-5 queue complete"

#!/usr/bin/env bash
# Seed-sweep runner — the TPU counterpart of the reference's SLURM arrays
# (scripts/hpc/train_*.slurm: 10 independent seeds per variant,
# submit_all_dirgate.sh: all five variants).
#
# Runs VARIANTS × SEEDS independent trainings sequentially on this host
# (one TPU chip trains orders of magnitude faster than the reference's
# 1-GPU jobs, so sequential seeds on one chip replace the 10-node array).
#
# Usage:
#   scripts/tpu/sweep_seeds.sh                      # 5 variants × 10 seeds
#   SEEDS=3 VARIANTS="tulip daisy" scripts/tpu/sweep_seeds.sh --num_envs 1024
set -euo pipefail

SEEDS="${SEEDS:-10}"
VARIANTS="${VARIANTS:-dandelion daisy lily tulip cyclamen}"
ROOT="$(cd "$(dirname "$0")/../.." && pwd)"

for variant in $VARIANTS; do
  for seed in $(seq 0 $((SEEDS - 1))); do
    run="DirGate_${variant}_seed${seed}"
    echo "──────────────────────────────────────────────────────"
    echo "[sweep] $run"
    python3 "$ROOT/scripts/train.py" \
      --config "$ROOT/configs/DirGate_${variant}.yaml" \
      --seed "$seed" \
      --log_dir "runs/$run" \
      --checkpoint_dir "checkpoints/$run" \
      "$@"
  done
done

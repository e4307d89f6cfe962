#!/usr/bin/env bash
# Resilient sequential run queue for a single (possibly flaky) TPU host.
#
# Complements sweep_seeds.sh: where that script assumes a healthy chip,
# this one survives the failure modes of shared/tunnelled TPU runtimes —
# multi-hour device outages, worker restarts that kill the running
# program, and transient launch errors. The reference's SLURM arrays get
# this resilience from the scheduler (requeue + 3-day walltime,
# scripts/hpc/train_*.slurm); on a raw TPU VM this script provides it:
#
#  - health-probes the device with a tiny timeout-guarded matmul and
#    WAITS (probe interval 2 min) instead of crashing while it is down;
#  - retries each run up to MAX_ATTEMPTS times, resuming from the newest
#    checkpoint (--checkpoint latest) so completed progress is never lost;
#  - skips runs whose final checkpoint already exists, so the whole queue
#    is idempotent — safe to re-launch after any interruption.
#
# Usage:
#   scripts/tpu/queue_runner.sh spec.txt    # one run per line:
#                                           #   <variant> <seed> [extra args]
#   SEEDS="4 5" VARIANTS="tulip daisy" scripts/tpu/queue_runner.sh
#
# Logs: $LOG (default /tmp/tpu_queue.log) + per-run /tmp/queue_<run>.log.
set -uo pipefail

ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
LOG="${LOG:-/tmp/tpu_queue.log}"
MAX_ATTEMPTS="${MAX_ATTEMPTS:-5}"
PROBE_LIMIT="${PROBE_LIMIT:-300}"          # probes before giving up (×2 min)
NUM_ENVS="${NUM_ENVS:-16}"
RUN_TIMEOUT="${RUN_TIMEOUT:-7200}"

note() { echo "[queue] $* ($(date))" >> "$LOG"; }

probe() {
  timeout 60 python3 -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
x = jnp.ones((128, 128)); (x @ x).block_until_ready()
" >/dev/null 2>&1
}

wait_healthy() {
  for _ in $(seq 1 "$PROBE_LIMIT"); do
    if probe; then note "TPU healthy"; return 0; fi
    sleep 120
  done
  note "TPU never recovered; aborting queue"
  exit 1
}

run_train() {
  local variant=$1 seed=$2; shift 2
  # optional `name=<tag>` first extra token: tags the run name
  # (DirGate_<variant>_<tag>_seed<seed>) so ablation runs (bf16, E64, …)
  # get their own log/checkpoint dirs and the skip/resume logic keys on
  # the right directory
  local tag="" first="${1:-}"
  case "$first" in name=*) tag="_${first#name=}"; shift;; esac
  local run="DirGate_${variant}${tag}_seed${seed}"
  local attempt resume=""
  if [ -d "$ROOT/checkpoints/$run/poca_final" ]; then
    note "$run already complete, skipping"; return 0
  fi
  if [ -n "$(ls "$ROOT/checkpoints/$run" 2>/dev/null)" ]; then
    resume="--checkpoint latest"
  fi
  local attempt=1
  while [ "$attempt" -le "$MAX_ATTEMPTS" ]; do
    wait_healthy
    local before
    before="$(ls -t "$ROOT/checkpoints/$run" 2>/dev/null | head -1)"
    note "$run attempt $attempt (resume='$resume')"
    # stdin redirected: in spec-file mode the surrounding while-read loop
    # owns stdin, and a child that reads it would eat queued spec lines
    timeout "$RUN_TIMEOUT" python3 "$ROOT/scripts/train.py" \
      --config "$ROOT/configs/DirGate_${variant}.yaml" \
      --seed "$seed" --num_envs "$NUM_ENVS" \
      --log_dir "$ROOT/runs/$run" --checkpoint_dir "$ROOT/checkpoints/$run" \
      $resume "$@" < /dev/null >> "/tmp/queue_${run}.log" 2>&1
    local rc=$?
    if [ "$rc" -eq 0 ]; then note "$run DONE"; return 0; fi
    local after
    after="$(ls -t "$ROOT/checkpoints/$run" 2>/dev/null | head -1)"
    if [ "$rc" -eq 124 ] && [ "$after" != "$before" ]; then
      # clean RUN_TIMEOUT slice that advanced the newest checkpoint: a
      # long healthy run, not a failure — resume without burning attempts
      # (SLURM-walltime-class runs complete as a chain of such slices)
      note "$run timed out but advanced to $after; not counting attempt"
    else
      note "$run failed rc=$rc (attempt $attempt/$MAX_ATTEMPTS)"
      attempt=$((attempt + 1))
    fi
    resume="--checkpoint latest"
    sleep 60
  done
  note "$run FAILED after $MAX_ATTEMPTS attempts"
  return 1
}

note "queue start"
if [ "$#" -ge 1 ] && [ -f "$1" ]; then
  # spec file: "<variant> <seed> [extra train.py args]" per line, # comments.
  # Process substitution (not a pipe) keeps the loop in the main shell so
  # wait_healthy's abort exits the whole queue instead of a subshell.
  while read -r variant seed extra; do
    # shellcheck disable=SC2086
    run_train "$variant" "$seed" $extra
  done < <(grep -vE '^\s*(#|$)' "$1")
else
  for variant in ${VARIANTS:-dandelion daisy lily tulip cyclamen}; do
    for seed in ${SEEDS:-0 1 2 3}; do
      run_train "$variant" "$seed"
    done
  done
fi
note "queue complete"

#!/usr/bin/env bash
# Launch SwarmACB-TPU training on a Cloud TPU pod slice.
#
# The TPU-native counterpart of the reference's scripts/hpc/*.slurm +
# submit_all_dirgate.sh: one process per TPU host (jax.distributed), the
# env batch sharded over every chip in the slice, learner gradients
# all-reduced over ICI (see swarmacb_tpu/parallel/mesh.py).
#
# Requires: gcloud configured, a TPU VM slice already created, and this
# repo synced to the same path on every worker (use --sync).
#
# Usage:
#   scripts/tpu/launch_pod.sh --tpu my-v5p-16 --zone us-east5-a \
#       --config configs/DirGate_dandelion.yaml --num_envs 4096 [--sync]
#   scripts/tpu/launch_pod.sh --tpu my-v5p-16 --zone us-east5-a --check
set -euo pipefail

TPU=""
ZONE=""
PROJECT="${PROJECT:-}"
REPO_DIR="${REPO_DIR:-\$HOME/swarmacb-tpu}"
CHECK=0
SYNC=0
TRAIN_ARGS=()

while [[ $# -gt 0 ]]; do
  case "$1" in
    --tpu)   TPU="$2"; shift 2 ;;
    --zone)  ZONE="$2"; shift 2 ;;
    --project) PROJECT="$2"; shift 2 ;;
    --repo-dir) REPO_DIR="$2"; shift 2 ;;
    --check) CHECK=1; shift ;;
    --sync)  SYNC=1; shift ;;
    *)       TRAIN_ARGS+=("$1"); shift ;;
  esac
done

[[ -n "$TPU" && -n "$ZONE" ]] || {
  echo "usage: $0 --tpu NAME --zone ZONE [--project P] [--sync] [--check] [train.py args...]" >&2
  exit 2
}

GCLOUD=(gcloud compute tpus tpu-vm)
[[ -n "$PROJECT" ]] && GCLOUD+=(--project "$PROJECT")

if [[ "$SYNC" == 1 ]]; then
  echo "[launch_pod] syncing repo to all workers..."
  SRC_DIR="$(cd "$(dirname "$0")/../.." && pwd)"
  # scp lands the tree under the LOCAL basename; move it to REPO_DIR so
  # the launch/check commands below find it regardless of checkout name
  "${GCLOUD[@]}" scp --recurse --worker=all --zone "$ZONE" \
    "$SRC_DIR" "$TPU":"$(dirname "$REPO_DIR")/"
  "${GCLOUD[@]}" ssh "$TPU" --zone "$ZONE" --worker=all --command \
    "src=$(dirname "$REPO_DIR")/$(basename "$SRC_DIR"); \
     if [ \"\$src\" != \"$REPO_DIR\" ]; then rm -rf $REPO_DIR && mv \"\$src\" $REPO_DIR; fi"
fi

if [[ "$CHECK" == 1 ]]; then
  echo "[launch_pod] running pre-flight check on all workers..."
  "${GCLOUD[@]}" ssh "$TPU" --zone "$ZONE" --worker=all --command \
    "cd $REPO_DIR && python3 scripts/tpu/check_env.py"
  exit $?
fi

# One process per host; jax.distributed.initialize() discovers the slice
# topology from the TPU metadata server. --data_parallel auto builds the
# mesh over every chip of every host.
QUOTED_ARGS=""
for a in ${TRAIN_ARGS[@]+"${TRAIN_ARGS[@]}"}; do
  QUOTED_ARGS+=" $(printf '%q' "$a")"
done
echo "[launch_pod] launching train.py on all workers of $TPU..."
"${GCLOUD[@]}" ssh "$TPU" --zone "$ZONE" --worker=all --command \
  "cd $REPO_DIR && nohup python3 scripts/train.py --distributed --data_parallel auto$QUOTED_ARGS > train_\$(hostname).log 2>&1 &"
echo "[launch_pod] started. Tail logs with:"
echo "  ${GCLOUD[*]} ssh $TPU --zone $ZONE --worker=0 --command 'tail -f $REPO_DIR/train_*.log'"

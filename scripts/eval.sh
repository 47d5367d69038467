#!/usr/bin/env bash
# Evaluation launcher (reference scripts/eval.sh equivalent).
# Usage: scripts/eval.sh <seq_name> <ckpt_path> [extra args...]
set -euo pipefail
SEQ=${1:?usage: eval.sh <seq_name> <ckpt_path>}
CKPT=${2:?usage: eval.sh <seq_name> <ckpt_path>}
shift 2
cd "$(dirname "$0")/.."
python -m rnnpose_tpu.tools.eval \
  --config_path "config/linemod/${SEQ}_fw0.5.yml" \
  --ckpt_path "$CKPT" "$@"

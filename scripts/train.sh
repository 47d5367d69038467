#!/usr/bin/env bash
# Training launcher (reference scripts/train.sh equivalent).
# Single-controller JAX: ONE process drives all local TPU chips.
# Usage: scripts/train.sh <seq_name> <model_dir> [extra args...]
set -euo pipefail
SEQ=${1:?usage: train.sh <seq_name> <model_dir>}
MODEL_DIR=${2:?usage: train.sh <seq_name> <model_dir>}
shift 2
cd "$(dirname "$0")/.."
python -m rnnpose_tpu.tools.train \
  --config_path "config/linemod/${SEQ}_fw0.5.yml" \
  --model_dir "$MODEL_DIR" "$@"

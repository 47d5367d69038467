#!/usr/bin/env bash
# Occlusion-LINEMOD evaluation (reference scripts/eval_lmocc.sh equivalent).
set -euo pipefail
SEQ=${1:?usage: eval_lmocc.sh <seq_name> <ckpt_path>}
CKPT=${2:?usage: eval_lmocc.sh <seq_name> <ckpt_path>}
shift 2
cd "$(dirname "$0")/.."
python -m rnnpose_tpu.tools.eval \
  --config_path "config/linemod/${SEQ}_fw0.5_occ.yml" \
  --ckpt_path "$CKPT" "$@"

#!/usr/bin/env bash
# Sustained shipping-budget training run + mid-run kill + --resume
# (VERDICT r3 Missing #1 protocol). Generates the rasterized synthetic
# LINEMOD-format dataset if absent, trains half the schedule, exits at the
# step-10000 checkpoint, resumes, and finishes. Curves land in
# $RUN_DIR/log.json.lst; train-step FLOPs/HBM via --cost_analysis.
set -euo pipefail
cd "$(dirname "$0")/.."

DATA=${DATA:-.data/synlm}
RUN_DIR=${RUN_DIR:-.data/runs/sustained}
STEPS=${STEPS:-20000}
KILL_AT=${KILL_AT:-10000}

if [ ! -f "$DATA/train_config.yml" ]; then
  python -m rnnpose_tpu.tools.make_synthetic_linemod \
    --out "$DATA" --frames 640 --eval_frames 64 --steps "$STEPS"
fi

python -m rnnpose_tpu.tools.train \
  --config_path "$DATA/train_config.yml" --model_dir "$RUN_DIR" \
  --steps "$STEPS" --stop_after "$KILL_AT" \
  --display_step 100 --loader_threads 4 \
  --eval_frames 64 --cost_analysis

python -m rnnpose_tpu.tools.train \
  --config_path "$DATA/train_config.yml" --model_dir "$RUN_DIR" \
  --steps "$STEPS" --resume \
  --display_step 100 --loader_threads 4 --eval_frames 64

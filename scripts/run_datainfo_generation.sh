#!/usr/bin/env bash
# Offline .info generation (reference scripts/run_datainfo_generation.sh
# equivalent). Produces the four dataset-info pickles the trainer consumes
# from a DeepIM-layout EXPDATA tree:
#   orig       — real LINEMOD frames (LM6d_converted/LM6d_refine)
#   syn        — synthetic renders (LM6d_converted/LM6d_refine_syn)
#   posecnnval — PoseCNN validation split with init poses
#   v2         — PVNet-rendering fuse data formatted by run_dataformatter.sh
# Usage: scripts/run_datainfo_generation.sh [EXPDATA_ROOT]
set -euo pipefail
cd "$(dirname "$0")/.."
EXPDATA=${1:-EXPDATA}
INFO_DIR="$EXPDATA/data_info/deepim"
mkdir -p "$INFO_DIR"

python -m rnnpose_tpu.tools.deepim_info orig \
  --data_root "$EXPDATA/LM6d_converted/LM6d_refine" \
  --out "$INFO_DIR/linemod_orig_deepim.info"

python -m rnnpose_tpu.tools.deepim_info syn \
  --data_root "$EXPDATA/LM6d_converted/LM6d_refine_syn" \
  --out "$INFO_DIR/linemod_syn_deepim.info"

python -m rnnpose_tpu.tools.deepim_info posecnnval \
  --data_root "$EXPDATA/LM6d_converted/LM6d_refine" \
  --out "$EXPDATA/data_info/linemod_posecnn.info"

python -m rnnpose_tpu.tools.deepim_info v2 \
  --data_root "$EXPDATA/LINEMOD/fuse_formatted" \
  --out "$EXPDATA/data_info/linemod_fuseformatted_all10k_deepim.info" \
  --ratio 1.0 --no_shuffle

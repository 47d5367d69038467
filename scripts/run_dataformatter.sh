#!/usr/bin/env bash
# PVNet-rendering → DeepIM-layout formatter (reference
# scripts/run_dataformatter.sh equivalent). Converts the PVNet fuse data
# (RGB + fused depth renders) into the per-frame directory layout that
# run_datainfo_generation.sh's `v2` step indexes.
# Usage: scripts/run_dataformatter.sh [EXPDATA_ROOT]
set -euo pipefail
cd "$(dirname "$0")/.."
EXPDATA=${1:-EXPDATA}

python -m rnnpose_tpu.tools.transform_pvnet_data fuse \
  --data_info "$EXPDATA/data_info/linemod_all_10k_default.info.all" \
  --data_root "$EXPDATA/raw_data/fuse" \
  --depth_root "$EXPDATA/raw_data/orig_renders" \
  --save_root "$EXPDATA/LINEMOD/fuse_formatted"

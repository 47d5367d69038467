#!/usr/bin/env bash
# Native-ops build (reference scripts/compile_3rdparty.sh equivalent).
# The reference compiles the KPConv C++ wrappers + the CUDA NN extension;
# here the single C++ host library (grid subsampling + radius neighbors,
# rnnpose_tpu/cpp/native_ops.cpp) covers both roles — the NN eval kernel
# runs on the TPU MXU (rnnpose_tpu/ops/knn.py) and needs no native build.
# The library also auto-builds on first import; this script exists for
# explicit provisioning (e.g. a container image bake).
set -euo pipefail
cd "$(dirname "$0")/.."
python - <<'PY'
from rnnpose_tpu.cpp import native

ok = native.build(force=True)
if not ok:
    raise SystemExit("native build failed (g++ unavailable?)")
print("built:", native.lib_path())
assert native.available(), "library built but failed to load"
print("native ops available: grid_subsample, radius_neighbors")
PY

#!/bin/bash
# reference demos/lion.sh analog (the BASELINE.json north-star workload).
# lion.xyz is a missing blob in the reference repo; tools/make_shape.py
# synthesizes a 180k-point single-component stand-in with GT normals.
source "$(dirname "$0")/common.sh"
N=${1:-180000}
python "$BASE_PATH/tools/make_shape.py" lion $N $OUT/lion.xyz
python -m dipole_tpu.cli.orient_large \
  --pc $OUT/lion.xyz --export_dir $OUT/lion \
  --models $MODELS \
  --iters 5 --propagation_iters 4 --number_parts 41 \
  --minimum_points_per_patch 100 --diffuse --weighted_prop --n 50
python "$BASE_PATH/tools/eval_result.py" $OUT/lion/final_result.xyz $OUT/lion.xyz

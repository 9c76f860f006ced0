#!/bin/bash
# reference demos/alien.sh analog. The alien scan (interpolate/
# consolidated.xyz) is a missing blob; tools/make_shape.py synthesizes a
# 150k-point single-component stand-in.
source "$(dirname "$0")/common.sh"
N=${1:-150000}
python "$BASE_PATH/tools/make_shape.py" alien $N $OUT/alien.xyz
python -m dipole_tpu.cli.orient_large \
  --pc $OUT/alien.xyz --export_dir $OUT/alien \
  --models $MODELS \
  --iters 5 --propagation_iters 4 --number_parts 41 \
  --minimum_points_per_patch 100 --diffuse --weighted_prop \
  --estimate_normals --curvature_threshold 0.01 --n 50
python "$BASE_PATH/tools/eval_result.py" $OUT/alien/final_result.xyz $OUT/alien.xyz

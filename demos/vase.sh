#!/bin/bash
# reference demos/vase.sh analog. vase.xyz is absent from the reference
# repo; tools/make_shape.py synthesizes a surface-of-revolution stand-in.
source "$(dirname "$0")/common.sh"
N=${1:-80000}
python "$BASE_PATH/tools/make_shape.py" vase $N $OUT/vase.xyz
python -m dipole_tpu.cli.orient_pointcloud \
  --pc $OUT/vase.xyz --export_dir $OUT/vase \
  --models $MODELS \
  --iters 5 --propagation_iters 4 --number_parts 25 \
  --minimum_points_per_patch 100 --weighted_prop --estimate_normals --diffuse
python "$BASE_PATH/tools/eval_result.py" $OUT/vase/final_result.xyz $OUT/vase.xyz

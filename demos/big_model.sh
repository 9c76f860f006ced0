#!/bin/bash
# reference demos/big_model.sh analog. The reference's big-model blob is
# missing from its repo; this generates a 500k-point composite with GT
# normals (5x over the reference server's admission limit) and runs the
# representative-point pipeline. NOTE: the composite has 4 disconnected
# components — per-component sign agreement is 89-100%, but dipole
# propagation can flip whole disconnected components relative to each other
# (a limitation shared with the reference; its global sign fix corrects only
# one overall flip).
source "$(dirname "$0")/common.sh"
N=${1:-500000}
python "$BASE_PATH/tools/make_big_model.py" $N $OUT/big_model.xyz
python -m dipole_tpu.cli.orient_large \
  --pc $OUT/big_model.xyz --export_dir $OUT/big_model \
  --models $MODELS \
  --iters 5 --propagation_iters 4 --number_parts 41 \
  --minimum_points_per_patch 100 --diffuse --weighted_prop \
  --estimate_normals --n 50

#!/bin/bash
# reference demos/boxunion.sh analog: large-cloud representative-point pipeline
source "$(dirname "$0")/common.sh"
python -m dipole_tpu.cli.orient_large \
  --pc $REF/data/boxunion.xyz --export_dir $OUT/boxunion \
  --models $MODELS \
  --iters 5 --propagation_iters 4 --number_parts 41 \
  --minimum_points_per_patch 100 --diffuse --weighted_prop \
  --estimate_normals --n 50

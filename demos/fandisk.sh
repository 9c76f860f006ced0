#!/bin/bash
# reference demos/fandisk.sh analog. Defaults to the 6-model mix:
# deterministic 0.9999 GT (BASELINE.md r4 table).
source "$(dirname "$0")/common.sh"
python -m dipole_tpu.cli.orient_pointcloud \
  --pc $REF/data/fandisk.xyz --export_dir $OUT/fandisk \
  --models $MODELS_MIX \
  --iters 10 --propagation_iters 5 --number_parts 30 \
  --minimum_points_per_patch 100 --curvature_threshold 0.01 \
  --diffuse --weighted_prop --estimate_normals

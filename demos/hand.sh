#!/bin/bash
# reference demos/hand.sh analog: patch pipeline + PointCNN ensemble.
# Defaults to the 6-model mix (both shipped trios): deterministic 0.9874 GT
# vs the reference code's own fresh-run 0.9849 (BASELINE.md r4 table).
# Exact upstream trio parity: MODELS_MIX="$MODELS" ./hand.sh
source "$(dirname "$0")/common.sh"
python -m dipole_tpu.cli.orient_pointcloud \
  --pc $REF/data/hand.xyz --export_dir $OUT/hand \
  --models $MODELS_MIX \
  --iters 10 --propagation_iters 5 --number_parts 30 \
  --minimum_points_per_patch 100 --curvature_threshold 0.01 \
  --diffuse --weighted_prop --estimate_normals

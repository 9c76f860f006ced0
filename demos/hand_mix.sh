#!/bin/bash
# hand with the 6-model mix — since round 4 this IS demos/hand.sh's default
# (deterministic 0.9874 GT vs the reference's own fresh-run 0.9849); kept as
# an explicit alias that always uses the mix regardless of MODELS overrides.
source "$(dirname "$0")/common.sh"
python -m dipole_tpu.cli.orient_pointcloud \
  --pc $REF/data/hand.xyz --export_dir $OUT/hand_mix \
  --models $MODELS_MIX \
  --iters 10 --propagation_iters 5 --number_parts 30 \
  --minimum_points_per_patch 100 --curvature_threshold 0.01 \
  --diffuse --weighted_prop --estimate_normals

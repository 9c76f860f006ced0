#!/bin/bash
# hand with the 6-model mix (shipped reference trio + first-party trained
# trio, pre_trained_tpu/) — the supported config for this hard shape:
# deterministic 0.9874 GT agreement vs 0.9379 for the 3-vote trio
# (demos/hand.sh) and 0.9849 for the reference's own best (BASELINE.md).
source "$(dirname "$0")/common.sh"
python -m dipole_tpu.cli.orient_pointcloud \
  --pc $REF/data/hand.xyz --export_dir $OUT/hand_mix \
  --models $MODELS_MIX \
  --iters 10 --propagation_iters 5 --number_parts 30 \
  --minimum_points_per_patch 100 --curvature_threshold 0.01 \
  --diffuse --weighted_prop --estimate_normals

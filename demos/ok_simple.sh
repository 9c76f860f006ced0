#!/bin/bash
# reference demos/ok_simple.sh analog: per-point propagation, no network
source "$(dirname "$0")/common.sh"
MODEL_NAME=${1:-ok.xyz}
python -m dipole_tpu.cli.orient_simple \
  --pc $REF/data/$MODEL_NAME --export_dir $OUT/${MODEL_NAME%.xyz}_simple \
  --diffuse --estimate_normals

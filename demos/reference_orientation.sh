#!/bin/bash
# reference demos/reference_orientation.sh analog (the Self-Sampling blobs
# are missing from the reference repo; transfer ok's orientation to hand-
# positioned copies as a stand-in pair)
source "$(dirname "$0")/common.sh"
python -m dipole_tpu.cli.reference_orientation \
  --input $REF/data/ok.xyz --reference $REF/data/ok.xyz \
  --output $OUT/reference_orientation.xyz

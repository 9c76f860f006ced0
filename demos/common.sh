#!/bin/bash
# Shared paths for the demo suite (reference demos/*.sh analogs, SURVEY C45).
export BASE_PATH=$(cd "$(dirname "${BASH_SOURCE[0]}")/.."; pwd)
export PYTHONPATH="$BASE_PATH${PYTHONPATH:+:$PYTHONPATH}"
export REF=${REF:-/root/reference}
export MODELS="$REF/pre_trained/hands2.pt $REF/pre_trained/hands.pt $REF/pre_trained/manmade.pt"
export OUT=${OUT:-/tmp/dipole_tpu_demos}
mkdir -p "$OUT"

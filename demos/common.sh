#!/bin/bash
# Shared paths for the demo suite (reference demos/*.sh analogs, SURVEY C45).
export BASE_PATH=$(cd "$(dirname "${BASH_SOURCE[0]}")/.."; pwd)
export PYTHONPATH="$BASE_PATH${PYTHONPATH:+:$PYTHONPATH}"
export REF=${REF:-/root/reference}
# reference's shipped trio (exact upstream demo parity); respects a caller
# override so MODELS="..." ./hand.sh works
export MODELS=${MODELS:-"$REF/pre_trained/hands2.pt $REF/pre_trained/hands.pt $REF/pre_trained/manmade.pt"}
# 6-model mix with the first-party trained trio — measurably better on the
# hard demos (hand 98.74% vs 98.34% GT, ok 98.56% vs 98.31%; BASELINE.md).
# Use:  MODELS="$MODELS_MIX" ./hand.sh
export MODELS_MIX="$MODELS $BASE_PATH/pre_trained_tpu/dipole_0.pt $BASE_PATH/pre_trained_tpu/dipole_1.pt $BASE_PATH/pre_trained_tpu/dipole_2.pt"
export OUT=${OUT:-/tmp/dipole_tpu_demos}
mkdir -p "$OUT"

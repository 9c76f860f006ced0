#!/bin/bash
# reference demos/run_folder.sh analog: batch GT-metric harness over .ply files
source "$(dirname "$0")/common.sh"
python -m dipole_tpu.cli.graph_dipole folder --folder "$1" --exp_name "${2:-exp}" --log_dir $OUT

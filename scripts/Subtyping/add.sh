#!/bin/bash
# 5-seed ADD on Subtyping (reference scripts/Subtyping/add.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping ADD ADD "${DATA}" "${@:2}"

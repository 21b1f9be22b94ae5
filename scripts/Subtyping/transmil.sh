#!/bin/bash
# 5-seed TransMIL on Subtyping (reference scripts/Subtyping/transmil.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping TransMIL TransMIL "${DATA}" "${@:2}"

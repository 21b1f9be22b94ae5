#!/bin/bash
# 5-seed TransMIL on Survival (reference scripts/Survival/transmil.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival TransMIL TransMIL "${DATA}" "${@:2}"

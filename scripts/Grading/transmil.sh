#!/bin/bash
# 5-seed TransMIL on Grading (reference scripts/Grading/transmil.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading TransMIL TransMIL "${DATA}" "${@:2}"

#!/bin/bash
# 5-seed ADD on Grading (reference scripts/Grading/add.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading ADD ADD "${DATA}" "${@:2}"

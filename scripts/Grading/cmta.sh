#!/bin/bash
# 5-seed CMTA on Grading (reference scripts/Grading/cmta.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading CMTA CMTA "${DATA}" "${@:2}"

#!/bin/bash
# 5-seed ConCAT on Grading (reference scripts/Grading/concat.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading ConCAT ConCAT "${DATA}" "${@:2}"

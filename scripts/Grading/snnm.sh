#!/bin/bash
# 5-seed SNNM on Grading (reference scripts/Grading/snnm.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading SNNM SNNM "${DATA}" "${@:2}"

#!/bin/bash
# 5-seed MCAT on Grading (reference scripts/Grading/mcat.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading MCAT MCAT "${DATA}" "${@:2}"

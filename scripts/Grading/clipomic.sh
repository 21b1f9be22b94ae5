#!/bin/bash
# 5-seed CLIPOMIC on Grading (reference scripts/Grading/clipomic.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading CLIPOMIC CLIPOMIC "${DATA}" "${@:2}"

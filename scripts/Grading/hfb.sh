#!/bin/bash
# 5-seed HFB on Grading (reference scripts/Grading/hfb.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading HFB HFB "${DATA}" "${@:2}"

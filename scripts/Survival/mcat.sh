#!/bin/bash
# 5-seed MCAT on Survival (reference scripts/Survival/mcat.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival MCAT MCAT "${DATA}" "${@:2}"

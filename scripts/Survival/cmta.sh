#!/bin/bash
# 5-seed CMTA on Survival (reference scripts/Survival/cmta.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival CMTA CMTA "${DATA}" "${@:2}"

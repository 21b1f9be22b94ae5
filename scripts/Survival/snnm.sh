#!/bin/bash
# 5-seed SNNM on Survival (reference scripts/Survival/snnm.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival SNNM SNNM "${DATA}" "${@:2}"

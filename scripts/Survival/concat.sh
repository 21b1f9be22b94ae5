#!/bin/bash
# 5-seed ConCAT on Survival (reference scripts/Survival/concat.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival ConCAT ConCAT "${DATA}" "${@:2}"

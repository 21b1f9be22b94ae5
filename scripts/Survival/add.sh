#!/bin/bash
# 5-seed ADD on Survival (reference scripts/Survival/add.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival ADD ADD "${DATA}" "${@:2}"

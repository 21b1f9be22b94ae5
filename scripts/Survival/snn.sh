#!/bin/bash
# 5-seed SNN on Survival (reference scripts/Survival/snn.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival SNN SNN "${DATA}" "${@:2}"

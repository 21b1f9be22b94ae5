#!/bin/bash
# 5-seed SNN on Classification (reference scripts/Classification/snn.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification SNN SNN "${DATA}" "${@:2}"

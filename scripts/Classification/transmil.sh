#!/bin/bash
# 5-seed TransMIL on Classification (reference scripts/Classification/transmil.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification TransMIL TransMIL "${DATA}" "${@:2}"

#!/bin/bash
# 5-seed ADD on Classification (reference scripts/Classification/add.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification ADD ADD "${DATA}" "${@:2}"

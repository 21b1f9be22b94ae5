#!/bin/bash
# 5-seed ConCAT on Classification (reference scripts/Classification/concat.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification ConCAT ConCAT "${DATA}" "${@:2}"

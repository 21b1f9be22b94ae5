#!/bin/bash
# 5-seed CMTA on Classification (reference scripts/Classification/cmta.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification CMTA CMTA "${DATA}" "${@:2}"

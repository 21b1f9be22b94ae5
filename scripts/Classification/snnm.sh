#!/bin/bash
# 5-seed SNNM on Classification (reference scripts/Classification/snnm.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification SNNM SNNM "${DATA}" "${@:2}"

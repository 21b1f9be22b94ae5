#!/bin/bash
# 5-seed MCAT on Classification (reference scripts/Classification/mcat.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification MCAT MCAT "${DATA}" "${@:2}"

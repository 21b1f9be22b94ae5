#!/bin/bash
# 5-seed CLIPOMIC on Classification (reference scripts/Classification/clipomic.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification CLIPOMIC CLIPOMIC "${DATA}" "${@:2}"

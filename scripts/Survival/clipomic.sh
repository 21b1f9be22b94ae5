#!/bin/bash
# 5-seed CLIPOMIC on Survival (reference scripts/Survival/clipomic.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival CLIPOMIC CLIPOMIC "${DATA}" "${@:2}"

#!/bin/bash
# 5-seed HFB on Survival (reference scripts/Survival/hfb.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival HFB HFB "${DATA}" "${@:2}"

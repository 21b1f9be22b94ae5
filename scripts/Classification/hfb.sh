#!/bin/bash
# 5-seed HFB on Classification (reference scripts/Classification/hfb.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification HFB HFB "${DATA}" "${@:2}"

#!/bin/bash
# 5-seed Porpoise on Survival (reference scripts/Survival/porpoise.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival Porpoise Porpoise "${DATA}" "${@:2}"

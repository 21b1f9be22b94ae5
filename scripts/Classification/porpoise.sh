#!/bin/bash
# 5-seed Porpoise on Classification (reference scripts/Classification/porpoise.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification Porpoise Porpoise "${DATA}" "${@:2}"

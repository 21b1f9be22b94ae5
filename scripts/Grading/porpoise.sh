#!/bin/bash
# 5-seed Porpoise on Grading (reference scripts/Grading/porpoise.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading Porpoise Porpoise "${DATA}" "${@:2}"

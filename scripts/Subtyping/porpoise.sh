#!/bin/bash
# 5-seed Porpoise on Subtyping (reference scripts/Subtyping/porpoise.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping Porpoise Porpoise "${DATA}" "${@:2}"

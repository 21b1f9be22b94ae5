#!/bin/bash
# 5-seed ConCAT on Subtyping (reference scripts/Subtyping/concat.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping ConCAT ConCAT "${DATA}" "${@:2}"

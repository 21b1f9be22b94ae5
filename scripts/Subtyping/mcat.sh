#!/bin/bash
# 5-seed MCAT on Subtyping (reference scripts/Subtyping/mcat.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping MCAT MCAT "${DATA}" "${@:2}"

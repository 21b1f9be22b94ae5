#!/bin/bash
# 5-seed SNNM on Subtyping (reference scripts/Subtyping/snnm.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping SNNM SNNM "${DATA}" "${@:2}"

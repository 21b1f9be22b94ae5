#!/bin/bash
# 5-seed SNN on Subtyping (reference scripts/Subtyping/snn.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping SNN SNN "${DATA}" "${@:2}"

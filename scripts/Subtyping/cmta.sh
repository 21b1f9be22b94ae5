#!/bin/bash
# 5-seed CMTA on Subtyping (reference scripts/Subtyping/cmta.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping CMTA CMTA "${DATA}" "${@:2}"

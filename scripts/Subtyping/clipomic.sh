#!/bin/bash
# 5-seed CLIPOMIC on Subtyping (reference scripts/Subtyping/clipomic.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping CLIPOMIC CLIPOMIC "${DATA}" "${@:2}"

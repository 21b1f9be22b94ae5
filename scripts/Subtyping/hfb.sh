#!/bin/bash
# 5-seed HFB on Subtyping (reference scripts/Subtyping/hfb.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping HFB HFB "${DATA}" "${@:2}"

#!/bin/bash
# 5-seed UMEML on Subtyping (reference scripts/Subtyping/umeml.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping UMEML MBTRAIN "${DATA}" "${@:2}"

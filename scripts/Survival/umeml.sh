#!/bin/bash
# 5-seed UMEML on Survival (reference scripts/Survival/umeml.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival UMEML MBTRAIN "${DATA}" "${@:2}"

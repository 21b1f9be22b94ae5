#!/bin/bash
# 5-seed UMEML on Grading (reference scripts/Grading/umeml.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading UMEML MBTRAIN "${DATA}" "${@:2}"

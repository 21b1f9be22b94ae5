#!/bin/bash
# 5-seed UMEML on Classification (reference scripts/Classification/umeml.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification UMEML MBTRAIN "${DATA}" "${@:2}"

#!/bin/bash
# 5-seed SNN on Grading (reference scripts/Grading/snn.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading SNN SNN "${DATA}" "${@:2}"

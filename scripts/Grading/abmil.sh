#!/bin/bash
# 5-seed ABMIL on Grading (reference scripts/Grading/abmil.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading ABMIL ABMIL "${DATA}" "${@:2}"

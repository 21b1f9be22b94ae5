#!/bin/bash
# 5-seed ABMIL on Survival (reference scripts/Survival/abmil.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival ABMIL ABMIL "${DATA}" "${@:2}"

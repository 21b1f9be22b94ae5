#!/bin/bash
# 5-seed ABMIL on Classification (reference scripts/Classification/abmil.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification ABMIL ABMIL "${DATA}" "${@:2}"

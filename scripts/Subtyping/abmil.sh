#!/bin/bash
# 5-seed ABMIL on Subtyping (reference scripts/Subtyping/abmil.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping ABMIL ABMIL "${DATA}" "${@:2}"

#!/bin/bash
# 5-seed UMEML_GAN on Grading (reference scripts/Grading/umeml_gan.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Grading UMEML_GAN MBTRAIN "${DATA}" "${@:2}"

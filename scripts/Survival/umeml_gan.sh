#!/bin/bash
# 5-seed UMEML_GAN on Survival (reference scripts/Survival/umeml_gan.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Survival UMEML_GAN MBTRAIN "${DATA}" "${@:2}"

#!/bin/bash
# 5-seed UMEML_GAN on Classification (reference scripts/Classification/umeml_gan.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Classification UMEML_GAN MBTRAIN "${DATA}" "${@:2}"

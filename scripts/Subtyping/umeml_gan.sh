#!/bin/bash
# 5-seed UMEML_GAN on Subtyping (reference scripts/Subtyping/umeml_gan.sh)
DATA=${1:-DATASET}
bash scripts/run_method.sh Subtyping UMEML_GAN MBTRAIN "${DATA}" "${@:2}"

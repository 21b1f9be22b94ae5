#!/bin/bash
# Cluster launcher for the flagship survival run
# (reference train_survival.sh SLURM wrapper; adapt resources to your pod)
#SBATCH --job-name=imp_tpu_survival
#SBATCH --cpus-per-task=8
bash scripts/Survival/umeml_gan.sh "$@"

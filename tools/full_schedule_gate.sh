#!/bin/bash
# Full-schedule throughput-vs-quality gate (BASELINE.md r5).
#
# Validates the batch-8 + linear-lr throughput configuration
# (configs/Survival/UMEML_GAN_THROUGHPUT.yaml) against the batch-2
# reference schedule at the FULL 10-epoch curriculum (GAN from epoch 3,
# replace ramp from epoch 5, CCA after every non-final epoch) on
# IDENTICAL synthetic folds.  Seeds are interleaved pairwise so partial
# results stay comparable; finished runs are skipped on re-invocation.
#
# Usage:  bash tools/full_schedule_gate.sh [OUT_DIR]
# r5 result: b2 83.93% +- 6.23%  vs  b8 87.60% +- 2.24% (~77 min, 1 chip).
set -u
cd "$(dirname "$0")/.."
ROOT=${GATE_DATA:-/tmp/qgate_data}
OUT=${1:-/tmp/fullgate_out}
mkdir -p "$OUT"

if [ ! -d "$ROOT/tcga_glioma" ]; then
  python - <<EOF
from imp_tpu.data import synthetic
synthetic.materialize('$ROOT', num_slides=200, bag_min=256, bag_max=2048,
                      feat_dim=512, num_genes=1020, group_size=170, seed=0)
print('materialized $ROOT')
EOF
fi

for SEED in 1 2 3 4 5; do
  for ARM in b2 b8; do
    if [ "$ARM" = b2 ]; then CFG=configs/Survival/UMEML_GAN.yaml
    else CFG=configs/Survival/UMEML_GAN_THROUGHPUT.yaml; fi
    DIR=$OUT/$ARM/seed${SEED}
    if [ -f "$DIR/done" ]; then echo "SKIP $ARM seed$SEED (done)"; continue; fi
    echo "=== $(date +%H:%M:%S) RUN $ARM seed$SEED ==="
    timeout 5400 python tools/train.py \
      --root "$ROOT" --seed $SEED --trainer MBTRAIN \
      --config-file $CFG --output-dir "$DIR" \
      DATASET.BAG_PAD 2048 \
      >> "$OUT/${ARM}_seed${SEED}.runlog" 2>&1 \
      && touch "$DIR/done" || echo "FAIL $ARM seed$SEED rc=$?"
  done
done
echo "=== $(date +%H:%M:%S) ALL DONE ==="
for ARM in b2 b8; do
  echo "--- $ARM ---"
  python tools/parse_test_res.py "$OUT/$ARM" --keyword cindex
done

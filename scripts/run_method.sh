#!/bin/bash
# Generic 5-seed (= 5-fold) runner (reference scripts/{Task}/{method}.sh):
#   bash scripts/run_method.sh <Task> <Method> <Trainer> <DATA_ROOT> [extra opts...]
TASK=$1; METHOD=$2; TRAINER=$3; DATA=$4; shift 4
for SEED in 1 2 3 4 5; do
  DIR=output/${TASK}/${METHOD}/seed${SEED}
  if [ -d "$DIR" ]; then
    echo "Results exist in ${DIR} (resuming)"
  fi
  python tools/train.py \
    --root "${DATA}" \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --config-file configs/${TASK}/${METHOD}.yaml \
    --output-dir ${DIR} \
    "$@"
done
python tools/parse_test_res.py output/${TASK}/${METHOD} --keyword cindex 2>/dev/null || \
python tools/parse_test_res.py output/${TASK}/${METHOD} --keyword accuracy

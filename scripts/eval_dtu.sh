#!/bin/bash
# Canonical DTU evaluation (mirrors reference scripts/eval_dtu.sh semantics:
# D=512, interval_scale=0.4, 7 views; prediction at up to 600x800).
set -e
DTU_TESTING=${DTU_TESTING:?set DTU_TESTING to the MVSNet-format DTU eval root}
CKPT=${CKPT:-/root/reference/checkpoints/model_dtu_v2.ckpt}
OUT=${OUT:-outputs/dtu}
python -m aa_rmvsnet_tpu.cli eval \
  --testpath "$DTU_TESTING" --testlist lists/dtu/test.txt \
  --preset dtu_eval_600x800 --loadckpt "$CKPT" --outdir "$OUT" "$@"

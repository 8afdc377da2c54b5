#!/bin/bash
# Canonical DTU training (reference scripts/train_dtu.sh: D=128,
# interval_scale=1.06, 5 views, image_scale 0.25, 10 epochs, lr 1e-3).
set -e
MVS_TRAINING=${MVS_TRAINING:?set MVS_TRAINING to the preprocessed DTU train root}
python -m aa_rmvsnet_tpu.cli train \
  --trainpath "$MVS_TRAINING" --trainlist lists/dtu/train.txt \
  --vallist lists/dtu/val.txt --logdir "${LOGDIR:-checkpoints_tpu}" \
  --epochs 10 --numdepth 128 --interval_scale 1.06 --view_num 5 \
  --image_scale 0.25 "$@"

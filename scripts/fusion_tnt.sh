#!/bin/bash
# Tanks & Temples padded-variant filtering + fusion (reference
# scripts/fusion_tnt.sh -> fusion_padding.py: crop 2 rows, pyrDown
# confidence, photo threshold 0.3, loose-sum vote >= 10).
set -e
TP_TESTING=${TP_TESTING:?set TP_TESTING}
OUT=${OUT:-outputs/tnt}
python -m aa_rmvsnet_tpu.cli fuse \
  --testpath "$TP_TESTING" --testlist lists/tnt_intermediate.txt \
  --outdir "$OUT" --test_dataset tnt_padded "$@"

#!/bin/bash
# DTU consistency filtering + fusion (photo threshold 0.35).
set -e
DTU_TESTING=${DTU_TESTING:?set DTU_TESTING}
OUT=${OUT:-outputs/dtu}
python -m aa_rmvsnet_tpu.cli fuse \
  --testpath "$DTU_TESTING" --testlist lists/dtu/test.txt \
  --outdir "$OUT" --test_dataset dtu "$@"

#!/bin/bash
# Tanks-and-Temples intermediate evaluation: inverse depth, padded pipeline,
# two width buckets like the reference (1024- and 960-wide scenes).
set -e
TP_TESTING=${TP_TESTING:?set TP_TESTING to the TnT intermediate root}
CKPT=${CKPT:?set CKPT}
OUT=${OUT:-outputs/tnt}
python -m aa_rmvsnet_tpu.cli eval \
  --testpath "$TP_TESTING" --testlist lists/tnt_intermediate.txt \
  --preset tnt_intermediate --loadckpt "$CKPT" --outdir "$OUT" "$@"

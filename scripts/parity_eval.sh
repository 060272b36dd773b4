#!/usr/bin/env bash
# Parity runbook for the accuracy gate (BASELINE.md: mIoU within 0.2 of the
# paper's Potsdam numbers vs the released .pdparams checkpoints,
# /root/reference/README.md:48-50).
#
# Run this the day a released checkpoint + dataset are mounted:
#
#   scripts/parity_eval.sh CKPT.pdparams DATA_ROOT CONFIG [--multi_scales] \
#       [EXTRA KEY VALUE ...]
#
# e.g.
#   scripts/parity_eval.sh ~/EMRT_potsdam.pdparams /data/Potsdam \
#       configs/EMRT/EMRT_256x256_160k_potsdam.yaml
#
# The .pdparams is converted in-process (emrt_tpu/utils/pdparams.py covers
# every reference checkpoint family; layouts verified against torch oracles
# in tests/test_pdparams_oracle.py) and val.py prints the paper-style
# per-class IoU / Precision / Recall / F1 table plus OA / mIoU / Kappa /
# mF1. Smoke-tested end-to-end on a synthetic fixture checkpoint by
# tests/test_pdparams_zoo.py::test_pdparams_end_to_end_val_and_pretrained.
set -euo pipefail

if [ "$#" -lt 3 ]; then
    grep '^#' "$0" | head -20
    exit 1
fi

CKPT=$1
DATA_ROOT=$2
CFG=$3
shift 3

cd "$(dirname "$0")/.."
exec python val.py --config "$CFG" --model_path "$CKPT" "$@" \
    DATA.DATA_PATH "$DATA_ROOT"

#!/usr/bin/env bash
# Canonical classification unlearning sweep
# (Classification/scripts/unlearn.sh parity): run every method on the same
# persisted 10% random split and append to one results CSV.
set -euo pipefail
CKPT=${1:?usage: unlearn_classification.sh <pretrained_ckpt> [retrain_ckpt]}
RETRAIN=${2:-}

for METHOD in Baseline Finetune GradAscent RandomLabel BadTeacher SCRUB SalUn SFRon; do
    python cli/main_random.py --unlearn_method "$METHOD" \
        --checkpoint "$CKPT" ${RETRAIN:+--retrain_checkpoint "$RETRAIN"} \
        --forget_ratio 0.1
done

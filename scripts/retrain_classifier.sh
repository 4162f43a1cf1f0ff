#!/usr/bin/env bash
# Canonical exact-unlearning retrain (Classification/scripts/retrain.sh
# parity): re-initialize and train on the retain split only, persisting the
# same random 10% split used by the other methods.
set -euo pipefail
CKPT=${1:?usage: retrain_classifier.sh <pretrained_ckpt> [dataset] [model]}
DATASET=${2:-CIFAR10}
MODEL=${3:-ResNet18}
SEED=${4:-0}

python cli/main_random.py --dataset "$DATASET" --model "$MODEL" \
    --unlearn_method Retrain --checkpoint "$CKPT" \
    --forget_ratio 0.1 --seed "$SEED"

#!/usr/bin/env bash
# Canonical DDPM CIFAR-10 class-forgetting pipeline (DDPM/README.md parity).
set -euo pipefail
PRETRAIN_DIR=${1:?usage: unlearn_ddpm.sh <pretrain_dir> [label]}
LABEL=${2:-0}

python cli/train.py --config configs/cifar10_sfron.yml --mode generate_fisher \
    --ckpt_folder "$PRETRAIN_DIR" --label_to_forget "$LABEL" --threshold 1.0

python cli/train.py --config configs/cifar10_sfron.yml --mode sfron \
    --ckpt_folder "$PRETRAIN_DIR" --label_to_forget "$LABEL" \
    --forget_alpha 10.0 --decay_forget_alpha --remain_alpha 1.0 \
    --method ron --unlearn_loss adaga \
    --mask_path "$PRETRAIN_DIR/mask_$LABEL/fisher_1.0"

#!/usr/bin/env bash
# Canonical classifier pretrain (Classification/scripts/pretrain.sh parity).
set -euo pipefail
python cli/main_pretrain.py --dataset "${1:-CIFAR10}" \
    --model "${2:-ResNet18}" --epochs 200 --lr 0.1 --batch_size 256

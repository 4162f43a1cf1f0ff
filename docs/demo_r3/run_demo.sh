#!/usr/bin/env bash
# Round-3 efficacy demo: quantitative Baseline/Retrain/SFRon comparison rows
# on real TPU hardware. Data is the class-structured synthetic stand-in
# (zero-egress environment: no CIFAR-10) — the numbers therefore demonstrate
# METHOD EFFICACY (directionality of forgetting), not the paper's CIFAR
# metric values; cli/parity_check.py covers real-number parity once local
# artifacts exist.
#
# Part A — classification comparative protocol (the reference's comparison
# table, Classification/main_random.py:113-148): one pretrained ResNet-18,
# three methods, one CSV row each.
#
# Part B — DDPM probe comparison (DDPM/classifier_evaluation.py:38-40):
# class-0 samples from the PRETRAINED model vs the SFR-on-UNLEARNED model
# through the same probe classifier; forgetting shows as avg_prob down /
# entropy up / UA down between the two CSV rows.
set -euo pipefail
cd "$(dirname "$0")/../.."
EXP=results_demo_r3

# ---- Part A: classification ------------------------------------------------
python cli/main_random.py --forget_mode class --label_to_forget 0 \
    --compare Baseline,Retrain,SFRon --pretrain_epochs 40 \
    --save_path $EXP/classification
cp $EXP/classification/results.csv docs/demo_r3/classification_results.csv

# ---- Part B: DDPM ----------------------------------------------------------
python cli/train.py --config configs/cifar10_pretrain.yml --mode pretrain \
    --exp $EXP --n_iters 8000
PRE=$(ls -d $EXP/cifar10/pretrain/* | head -1)

python cli/train.py --config configs/cifar10_fisher.yml \
    --mode generate_fisher --exp $EXP --ckpt_folder "$PRE" \
    --label_to_forget 0 --threshold 1.0
# fisher ratio mask is written next to the source checkpoint
# (mask_<label>/fisher_<threshold>, reference generate_fisher_mask.py layout)
MASK=$PRE/mask_0/fisher_1.0

python cli/train.py --config configs/cifar10_sfron.yml --mode sfron \
    --exp $EXP --ckpt_folder "$PRE" --label_to_forget 0 \
    --forget_alpha 10.0 --decay_forget_alpha --remain_alpha 1.0 \
    --method ron --unlearn_loss adaga --mask_path "$MASK"
# sfron run dirs use the reference hyperparam encoding:
# <exp>/cifar10/forget_<label>/<method>_<loss><lambd>/f<alpha>..._r..._lr.../<ts>
SFRON=$(ls -dt $EXP/cifar10/forget_0/*/*/* | head -1)

# class-0-conditioned samples from both models. --no-use_ema: the reference
# samples the EMA shadow after 800k iters; at this demo's 2000 iters the
# 0.9999-rate EMA is still ~82% random init, so sample the raw params.
python cli/sample.py --config configs/cifar10_sample.yml \
    --mode sample_one_class --class_label 0 --ckpt_folder "$PRE" \
    --n_samples_per_class 256 --no-use_ema --out $EXP/samples_pretrain_c0
python cli/sample.py --config configs/cifar10_sample.yml \
    --mode sample_one_class --class_label 0 --ckpt_folder "$SFRON" \
    --n_samples_per_class 256 --no-use_ema --out $EXP/samples_sfron_c0

# probe classifier on the same (synthetic) train data, then both rows.
# noise_std hardens the probe against generative-sample fuzz (the reference
# probe gets the equivalent robustness from 224px real-data fine-tuning).
python cli/train_classifier.py --epochs 5 --image_size 32 \
    --noise_std 0.05 --save_path $EXP/probe
# --image_size MUST match the probe's training resolution (32 here; the
# reference's fine-tuned ResNet-34 uses the 224 default)
python cli/classifier_evaluation.py $EXP/samples_pretrain_c0 \
    --classifier_ckpt $EXP/probe --label_of_forgotten_class 0 \
    --image_size 32 --csv docs/demo_r3/ddpm_probe.csv
python cli/classifier_evaluation.py $EXP/samples_sfron_c0 \
    --classifier_ckpt $EXP/probe --label_of_forgotten_class 0 \
    --image_size 32 --csv docs/demo_r3/ddpm_probe.csv

echo "demo artifacts: docs/demo_r3/classification_results.csv, ddpm_probe.csv"

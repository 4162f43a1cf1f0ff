#!/usr/bin/env bash
# Round-4 efficacy demo — classification comparative protocol with a
# QUANTITATIVE JS margin and the SVC-MIA column (round-3 verdict item 6).
#
# Data is the class-structured synthetic stand-in (zero-egress environment:
# no CIFAR-10), now generated with --synthetic_affinity 0.4: each class mean
# blends 40% toward its ring-successor, so the forgotten class has a
# well-defined nearest retained class the way CIFAR's semantically-close
# classes do. Without this the synthetic classes are mutually equidistant,
# a retrained model's forget-set predictions are per-sample noise, and NO
# unlearning method can approach them in JS — the r3 demo's thin 9% margin
# was a property of the data, not of SFR-on.
#
# Emits one CSV row per method (Classification/main_random.py:113-148
# protocol) including svc_mia_confidence / svc_mia_entropy / svc_mia_m_entropy
# (evaluation/svc_mia.py:44-143: fraction of forget samples the SVC shadow
# attacker reads as NON-members; Retrain = ceiling) and js_div vs Retrain.
#
# The DDPM probe demo (Part B of docs/demo_r3/run_demo.sh) is unchanged —
# see docs/demo_r3/ddpm_probe.csv for those numbers.
set -euo pipefail
cd "$(dirname "$0")/../.."
EXP=results_demo_r4

python cli/main_random.py --forget_mode class --label_to_forget 0 \
    --compare Baseline,Retrain,SFRon --pretrain_epochs 40 \
    --synthetic_affinity 0.4 \
    --save_path $EXP/classification
cp $EXP/classification/results.csv docs/demo_r4/classification_results.csv

echo "demo artifact: docs/demo_r4/classification_results.csv"

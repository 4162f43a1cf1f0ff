#!/usr/bin/env bash
# Round-5 efficacy demo — the round-4 comparative protocol with the
# SVC-MIA columns DE-SATURATED (round-4 verdict item 7).
#
# New vs demo_r4: --synthetic_noise 0.5 --pretrain_lr 0.05. At the old
# per-sample noise (0.1) the stand-in task was trivially generalizable —
# members and non-members were indistinguishable to the shadow attacker
# and the SVC-MIA columns saturated at the 0/1 boundary (confidence 1.0
# for Retrain AND SFRon — a degenerate discriminator that over-forgetting
# would also pass). At 0.5 the baseline generalization gap is real, so
# svc_mia_entropy becomes a live column: Baseline reads near the member
# level, Retrain strictly inside (0,1), and an unlearner is bounded above
# by Retrain's level. The confidence / m-entropy columns still read 1.0
# for Retrain — that saturation is STRUCTURAL under full-class removal
# (the true-label probability collapses for ANY effective method, exact
# retraining included), not a data artifact; they remain sanity columns.
#
# --pretrain_lr 0.05: the reference recipe's 0.1 peak lr diverges on the
# noisier stand-in (Retrain inherits the same lr; at the default 0.1
# nothing changes vs the reference recipe).
#
# tests/test_efficacy.py::test_svc_mia_forget_efficacy asserts the
# non-degenerate ordering and bounds SFRon above by Retrain+0.10 on the
# entropy column (over-forgetting detection), plus a retain-side accuracy
# floor vs Retrain.
set -euo pipefail
cd "$(dirname "$0")/../.."
EXP=results_demo_r5
rm -rf $EXP   # results.csv appends; a fresh dir keeps one triplet per demo

python cli/main_random.py --forget_mode class --label_to_forget 0 \
    --compare Baseline,Retrain,SFRon --pretrain_epochs 40 \
    --synthetic_affinity 0.4 --synthetic_noise 0.5 --pretrain_lr 0.05 \
    --save_path $EXP/classification
cp $EXP/classification/results.csv docs/demo_r5/classification_results.csv

echo "demo artifact: docs/demo_r5/classification_results.csv"

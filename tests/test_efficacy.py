"""Efficacy gate: prove the unlearning actually unlearns.

Runs the reference's comparative protocol (Classification/main_random.py:
113-148) at micro scale on class-structured synthetic data: pretrain once,
then Baseline / Retrain / SFRon rows, asserting DIRECTIONALITY — forget-class
accuracy collapses to Retrain's level while retain/test accuracy holds and
the MIA probe does not worsen. This is the gate VERDICT r2 called the
highest-leverage gap: everything else shows the pipeline *runs*; this shows
it *works*.
"""
import numpy as np
import pytest

from uurg_tpu.data.datasets import synthetic_dataset
from uurg_tpu.models.resnet import BasicBlock, ResNet
from uurg_tpu.unlearn.protocol import (assert_efficacy, evaluate, pretrain,
                                       run_comparison)

pytestmark = pytest.mark.slow

N_CLASSES = 5


def _micro_model():
    # 3-stage BasicBlock ResNet, width 16 (~90k params): big enough to
    # memorize the synthetic class patterns, small enough for the 1-core box
    return ResNet([1, 1, 1], BasicBlock, num_classes=N_CLASSES, width=16)


@pytest.fixture(scope="module")
def comparison_rows():
    train = synthetic_dataset(1500, 16, 3, N_CLASSES, seed=0)
    test = synthetic_dataset(500, 16, 3, N_CLASSES, seed=1)
    rows = run_comparison(
        _micro_model(), train, test,
        methods=("Baseline", "Retrain", "SFRon"),
        forget_mode="class", label_to_forget=0,
        batch_size=128, seed=0, num_classes=N_CLASSES,
        pretrain_epochs=6, pretrain_lr=0.05,
        overrides={
            "Retrain": {"epochs": 6, "lr": 0.05},
            # micro-scale SFRon: 150 iters, forget every 5, cosine alpha
            "SFRon": {"n_iters": 150, "retain_lr": 0.01,
                      "forget_alpha": 25.0, "scan_chunk": 50},
        })
    return rows


def test_baseline_remembers(comparison_rows):
    base = next(r for r in comparison_rows if r["method"] == "Baseline")
    assert base["forget_acc"] >= 0.95
    assert base["retain_acc"] >= 0.95
    assert base["test_retain_acc"] >= 0.90


def test_retrain_is_exact_unlearning(comparison_rows):
    rt = next(r for r in comparison_rows if r["method"] == "Retrain")
    # never saw class 0: prediction of it can only be spurious
    assert rt["forget_acc"] <= 0.10
    assert rt["test_forget_acc"] <= 0.10
    assert rt["retain_acc"] >= 0.95


def test_sfron_forgets_like_retrain_and_retains_like_baseline(
        comparison_rows):
    assert_efficacy(comparison_rows, forget_floor=0.90,
                    collapse_ceiling=0.15, retain_slack=0.06)
    sf = next(r for r in comparison_rows if r["method"] == "SFRon")
    rt = next(r for r in comparison_rows if r["method"] == "Retrain")
    # forget-class generalization collapses too (full-class semantics)
    assert sf["test_forget_acc"] <= 0.15
    # and the gap to exact unlearning is small
    assert abs(sf["forget_acc"] - rt["forget_acc"]) <= 0.15


def test_mia_direction(comparison_rows):
    by = {r["method"]: r for r in comparison_rows}
    # the attacker should not be MORE confident the forget set was a member
    # after unlearning than before
    assert by["SFRon"]["mia"] <= by["Baseline"]["mia"] + 0.05

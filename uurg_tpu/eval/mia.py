"""Membership-inference attacks.

- ``membership_attack_prob``: logistic-regression attack on entropy /
  modified-entropy features (Classification/evaluation/mia.py:72-87).
- ``svc_mia``: SVC(RBF) shadow-model attack over confidence / entropy /
  m-entropy features (Classification/evaluation/svc_mia.py:44-143).

Inputs are (softmax probs, labels) numpy arrays — model inference is done by
the caller (Classifier.collect_logits) so these evaluators are pure host code.
"""
from __future__ import annotations

import numpy as np

from uurg_tpu.eval.features import confidence, entropy, m_entropy


def membership_attack_prob(
    retain_probs: np.ndarray,
    retain_labels: np.ndarray,
    forget_probs: np.ndarray,
    forget_labels: np.ndarray,
    test_probs: np.ndarray,
    test_labels: np.ndarray,
    metric: str = "entropy",
) -> float:
    """Fraction of forget samples the attacker still classifies as members.

    Attacker: LogisticRegression(balanced) trained on retain(=member) vs
    test(=non-member) features.
    """
    from sklearn.linear_model import LogisticRegression

    if metric == "entropy":
        feat = lambda p, y: entropy(p)
    elif metric == "m_entropy":
        feat = m_entropy
    else:
        raise NotImplementedError(metric)

    X_r = np.concatenate([feat(retain_probs, retain_labels),
                          feat(test_probs, test_labels)]).reshape(-1, 1)
    Y_r = np.concatenate([np.ones(len(retain_probs)),
                          np.zeros(len(test_probs))])
    X_f = feat(forget_probs, forget_labels).reshape(-1, 1)

    clf = LogisticRegression(class_weight="balanced", solver="lbfgs")
    clf.fit(X_r, Y_r)
    return float(clf.predict(X_f).mean())


def _svc_fit_predict(shadow_train, shadow_test, target_train, target_test) -> float:
    from sklearn.svm import SVC

    X = np.concatenate([shadow_train, shadow_test]).reshape(
        len(shadow_train) + len(shadow_test), -1)
    Y = np.concatenate([np.ones(len(shadow_train)),
                        np.zeros(len(shadow_test))])
    clf = SVC(C=3, gamma="auto", kernel="rbf")
    clf.fit(X, Y)
    accs = []
    if len(target_train):
        accs.append(clf.predict(target_train.reshape(len(target_train), -1)).mean())
    if len(target_test):
        accs.append(1 - clf.predict(target_test.reshape(len(target_test), -1)).mean())
    return float(np.mean(accs))


def svc_mia(
    shadow_train: tuple[np.ndarray, np.ndarray],
    shadow_test: tuple[np.ndarray, np.ndarray],
    target_train: tuple[np.ndarray, np.ndarray],
    target_test: tuple[np.ndarray, np.ndarray],
) -> dict:
    """Each argument is (softmax_probs, labels); target_* may be empty.

    Returns {"confidence", "entropy", "m_entropy"} attack accuracies.
    """
    out = {}
    for name, feat in [
        ("confidence", confidence),
        ("entropy", lambda p, y: entropy(p)),
        ("m_entropy", m_entropy),
    ]:
        out[name] = _svc_fit_predict(
            feat(*shadow_train), feat(*shadow_test),
            feat(*target_train) if len(target_train[0]) else np.zeros((0, 1)),
            feat(*target_test) if len(target_test[0]) else np.zeros((0, 1)),
        )
    return out

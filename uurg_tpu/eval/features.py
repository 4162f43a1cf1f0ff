"""Per-sample attack features: entropy, modified entropy, confidence.

Parity: Classification/evaluation/mia.py:8-22 / svc_mia.py:7-21. All pure
numpy on softmax probabilities (these run host-side post-inference).

NOTE: the reference's ``m_entropy`` indexes ``p[:, labels]`` with the whole
label VECTOR, which swaps entire columns rather than each sample's own true
class (an upstream bug copied from the SalUn codebase). We implement the
intended Song&Mittal modified-entropy (per-sample true-class gather) — the
metric the reference means to compute.
"""
from __future__ import annotations

import numpy as np


def softmax(logits: np.ndarray) -> np.ndarray:
    z = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def entropy(p: np.ndarray) -> np.ndarray:
    return -np.sum(np.where(p > 0, p * np.log(p, where=p > 0), 0.0), axis=-1)


def m_entropy(p: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Modified entropy: -sum_i mod_p_i * mod_log_p_i where the true-class
    column uses (1-p, log p) and the rest use (p, log(1-p))."""
    eps = 1e-30
    n = np.arange(len(p))
    log_p = np.log(np.maximum(p, eps))
    log_rev = np.log(np.maximum(1.0 - p, eps))
    mod_p = p.copy()
    mod_p[n, labels] = 1.0 - p[n, labels]
    mod_log = log_rev.copy()
    mod_log[n, labels] = log_p[n, labels]
    return -np.sum(mod_p * mod_log, axis=-1)


def confidence(p: np.ndarray, labels: np.ndarray) -> np.ndarray:
    return p[np.arange(len(p)), labels]


def correctness(p: np.ndarray, labels: np.ndarray) -> np.ndarray:
    return (np.argmax(p, axis=-1) == labels).astype(np.int32)

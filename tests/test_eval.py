"""Evaluation stack tests: MIA features, attacks, JS divergence."""
import numpy as np
import pytest

from uurg_tpu.eval.features import confidence, entropy, m_entropy, softmax
from uurg_tpu.eval.js_div import get_js_divergence, js_divergence
from uurg_tpu.eval.mia import membership_attack_prob, svc_mia


def test_entropy_uniform_max():
    p_uniform = np.full((1, 4), 0.25)
    p_onehot = np.asarray([[1.0, 0.0, 0.0, 0.0]])
    assert entropy(p_uniform)[0] == pytest.approx(np.log(4))
    assert entropy(p_onehot)[0] == pytest.approx(0.0)


def test_m_entropy_true_class_gather():
    p = np.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]])
    y = np.asarray([0, 1])
    me = m_entropy(p, y)
    # manual for sample 0: true class uses (1-p0, log p0); others (p, log(1-p))
    m0 = -((1 - 0.7) * np.log(0.7) + 0.2 * np.log(0.8) + 0.1 * np.log(0.9))
    assert me[0] == pytest.approx(m0, rel=1e-6)


def test_confidence():
    p = np.asarray([[0.7, 0.3], [0.4, 0.6]])
    np.testing.assert_allclose(confidence(p, np.asarray([0, 0])), [0.7, 0.4])


def test_js_divergence_properties():
    p = np.asarray([[0.9, 0.1], [0.5, 0.5]])
    q = np.asarray([[0.9, 0.1], [0.5, 0.5]])
    assert get_js_divergence(p, q) == pytest.approx(0.0, abs=1e-8)
    r = np.asarray([[0.1, 0.9], [0.5, 0.5]])
    assert get_js_divergence(p, r) > 0
    # symmetric
    np.testing.assert_allclose(js_divergence(p, r), js_divergence(r, p),
                               rtol=1e-8)


def _fake_probs(rng, n, peaked):
    logits = rng.normal(0, 1, (n, 10))
    if peaked:
        logits[np.arange(n), rng.integers(0, 10, n)] += 6.0
    return softmax(logits)


def test_membership_attack_separates_members():
    rng = np.random.default_rng(0)
    # members: confident (low entropy); non-members: diffuse
    member = _fake_probs(rng, 200, peaked=True)
    non = _fake_probs(rng, 200, peaked=False)
    forget_member_like = _fake_probs(rng, 100, peaked=True)
    y = lambda n: rng.integers(0, 10, n)
    prob = membership_attack_prob(member, y(200), forget_member_like, y(100),
                                  non, y(200))
    assert prob > 0.8  # member-like forget samples flagged as members
    forget_non_like = _fake_probs(rng, 100, peaked=False)
    prob2 = membership_attack_prob(member, y(200), forget_non_like, y(100),
                                   non, y(200))
    assert prob2 < 0.4


def test_svc_mia_runs_and_keys():
    rng = np.random.default_rng(1)
    mk = lambda n, peaked: (_fake_probs(rng, n, peaked),
                            rng.integers(0, 10, n))
    out = svc_mia(mk(100, True), mk(100, False), mk(50, True), mk(50, False))
    assert set(out) == {"confidence", "entropy", "m_entropy"}
    assert all(0.0 <= v <= 1.0 for v in out.values())
    assert out["entropy"] > 0.6  # separable by construction

"""Generative metric tests: FID math, IS, precision/recall, pipeline."""
import numpy as np
import pytest

from uurg_tpu.eval.generative import (
    FIDStatistics,
    compute_fid,
    evaluate_all,
    inception_score,
    precision_recall,
)


def test_fid_zero_for_identical_distribution():
    rng = np.random.default_rng(0)
    feats = rng.normal(0, 1, (500, 16))
    assert compute_fid(feats, feats.copy()) == pytest.approx(0.0, abs=1e-6)


def test_fid_closed_form_mean_shift():
    # identical covariance, mean shift d: FID = |d|^2
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (20000, 4))
    b = a + np.asarray([1.0, 0, 0, 0])
    fid = compute_fid(a, b)
    assert fid == pytest.approx(1.0, abs=0.05)


def test_fid_increases_with_shift():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 1, (1000, 8))
    fids = [compute_fid(a, a + s) for s in (0.5, 1.0, 2.0)]
    assert fids[0] < fids[1] < fids[2]


def test_inception_score_bounds():
    rng = np.random.default_rng(0)
    # uniform predictions -> IS ~ 1
    logits_flat = np.zeros((100, 10))
    assert inception_score(logits_flat) == pytest.approx(1.0, abs=1e-5)
    # confident diverse predictions -> IS ~ num_classes
    labels = rng.integers(0, 10, 1000)
    logits_conf = np.full((1000, 10), -50.0)
    logits_conf[np.arange(1000), labels] = 50.0
    assert inception_score(logits_conf) == pytest.approx(10.0, rel=0.05)


def test_precision_recall_identical_high():
    rng = np.random.default_rng(0)
    feats = rng.normal(0, 1, (300, 8))
    p, r = precision_recall(feats, feats.copy())
    assert p > 0.95 and r > 0.95


def test_precision_recall_disjoint_low():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.5, (300, 8))
    b = rng.normal(50, 0.5, (300, 8))  # far away
    p, r = precision_recall(a, b)
    assert p < 0.05 and r < 0.05


def test_precision_recall_mode_collapse_signature():
    # sample = tight cluster inside ref: precision high, recall low
    rng = np.random.default_rng(0)
    ref = rng.normal(0, 1, (500, 8))
    sample = rng.normal(0, 0.01, (500, 8))
    p, r = precision_recall(ref, sample)
    assert p > 0.9
    assert r < 0.3


def test_evaluate_all_with_stub_extractor():
    rng = np.random.default_rng(0)

    def extractor(images):
        n = len(images)
        flat = images.reshape(n, -1).astype(np.float32) / 255.0
        pool = flat[:, :32]
        spatial = flat[:, 32:64]
        logits = flat[:, :10] * 10
        return pool, spatial, logits

    ref = rng.integers(0, 255, (200, 8, 8, 3), np.uint8)
    out = evaluate_all(extractor, ref, ref.copy(), batch_size=64)
    assert set(out) == {"inception_score", "fid", "sfid", "precision",
                       "recall"}
    assert out["fid"] == pytest.approx(0.0, abs=1e-4)
    assert out["precision"] > 0.9


@pytest.mark.slow
def test_inception_architecture_shapes():
    import jax
    from uurg_tpu.eval.inception import init_inception, make_extractor

    model, variables = init_inception(jax.random.key(0))
    extract = make_extractor(variables)
    imgs = np.zeros((2, 32, 32, 3), np.uint8)
    pool, spatial, logits = extract(imgs)
    assert pool.shape == (2, 2048)
    assert spatial.shape == (2, 2023)  # 17x17x7 sFID features
    assert logits.shape == (2, 1008)

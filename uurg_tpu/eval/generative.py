"""Generative-model evaluation metrics: FID, sFID, Inception Score,
Precision/Recall.

Parity target: DDPM/evaluator.py:39-743 (the ADM TF1 evaluation suite).
Metric math here is extractor-agnostic: any callable mapping uint8 NHWC
images -> (pool_features, spatial_features, logits) can drive it. The
bundled extractor is the Flax InceptionV3 port in
``uurg_tpu.eval.inception`` (weights loaded from a local npz; preprocessing
matches the TF graph's bilinear-resize+scale).

- FID:   Frechet distance between Gaussians fit to pool3 (2048-d) features.
- sFID:  same distance on early spatial features (mixed_6/conv 7x7x768,
         flattened) — DDPM/evaluator.py reads both feature sets at once.
- IS:    exp(E_x KL(p(y|x) || p(y))) over softmax logits.
- P/R:   improved precision/recall via k-NN radii (ManifoldEstimator,
         DDPM/evaluator.py:261-344 semantics, k=3).
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class FIDStatistics:
    mu: np.ndarray
    sigma: np.ndarray

    @classmethod
    def from_features(cls, feats: np.ndarray) -> "FIDStatistics":
        return cls(mu=np.mean(feats, axis=0),
                   sigma=np.cov(feats, rowvar=False))

    def frechet_distance(self, other: "FIDStatistics",
                         eps: float = 1e-6) -> float:
        """d^2 = |mu1 - mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))."""
        import scipy.linalg

        mu1, s1, mu2, s2 = self.mu, self.sigma, other.mu, other.sigma
        diff = mu1 - mu2
        covmean, _ = scipy.linalg.sqrtm(s1.dot(s2), disp=False)
        if not np.isfinite(covmean).all():
            offset = np.eye(s1.shape[0]) * eps
            covmean = scipy.linalg.sqrtm(
                (s1 + offset).dot(s2 + offset))
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        return float(diff.dot(diff) + np.trace(s1) + np.trace(s2)
                     - 2 * np.trace(covmean))


def compute_fid(feats_ref: np.ndarray, feats_sample: np.ndarray) -> float:
    return FIDStatistics.from_features(feats_ref).frechet_distance(
        FIDStatistics.from_features(feats_sample))


def inception_score(logits: np.ndarray, split_size: int = 5000) -> float:
    """Mean IS over splits (ADM convention)."""
    scores = []
    for i in range(0, len(logits), split_size):
        part = logits[i : i + split_size]
        # softmax
        z = part - part.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        kl = p * (np.log(p + 1e-10) - np.log(p.mean(axis=0, keepdims=True)
                                             + 1e-10))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores))


def _pairwise_sq_dists(a: np.ndarray, b: np.ndarray,
                       block: int = 4096) -> np.ndarray:
    """Blocked squared euclidean distances (row batches keep memory flat)."""
    out = np.empty((len(a), len(b)), np.float32)
    b_sq = np.sum(b.astype(np.float64) ** 2, axis=1)
    for i in range(0, len(a), block):
        chunk = a[i : i + block].astype(np.float64)
        d = (np.sum(chunk**2, axis=1)[:, None] + b_sq[None, :]
             - 2 * chunk @ b.astype(np.float64).T)
        out[i : i + block] = np.maximum(d, 0)
    return out


def knn_radii(feats: np.ndarray, k: int = 3) -> np.ndarray:
    """Distance to the k-th nearest neighbor (excluding self)."""
    d = _pairwise_sq_dists(feats, feats)
    np.fill_diagonal(d, np.inf)
    return np.sort(d, axis=1)[:, k - 1]


def precision_recall(feats_ref: np.ndarray, feats_sample: np.ndarray,
                     k: int = 3) -> tuple[float, float]:
    """Improved precision/recall (Kynkaanniemi et al.), ADM k=3.

    precision: fraction of samples inside some ref manifold sphere;
    recall: fraction of refs inside some sample manifold sphere.
    """
    r_ref = knn_radii(feats_ref, k)
    r_sam = knn_radii(feats_sample, k)
    d = _pairwise_sq_dists(feats_sample, feats_ref)
    precision = float(np.mean(np.any(d <= r_ref[None, :], axis=1)))
    recall = float(np.mean(np.any(d.T <= r_sam[None, :], axis=1)))
    return precision, recall


def evaluate_all(
    extractor,
    ref_images: np.ndarray,
    sample_images: np.ndarray,
    batch_size: int = 256,
) -> dict:
    """Full ADM metric sweep (DDPM/evaluator.py:60-76 printout parity)."""
    def run(images):
        pools, spatials, logits = [], [], []
        for i in range(0, len(images), batch_size):
            p, s, l = extractor(images[i : i + batch_size])
            pools.append(np.asarray(p))
            spatials.append(np.asarray(s))
            logits.append(np.asarray(l))
        return (np.concatenate(pools), np.concatenate(spatials),
                np.concatenate(logits))

    ref_pool, ref_sp, _ = run(ref_images)
    sam_pool, sam_sp, sam_logits = run(sample_images)
    prec, rec = precision_recall(ref_pool, sam_pool)
    return {
        "inception_score": inception_score(sam_logits),
        "fid": compute_fid(ref_pool, sam_pool),
        "sfid": compute_fid(ref_sp, sam_sp),
        "precision": prec,
        "recall": rec,
    }

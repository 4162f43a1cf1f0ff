"""Classifier-probe evaluation of generated samples (unlearning accuracy).

Parity target: DDPM/classifier_evaluation.py:16-147 — run a fine-tuned
classifier (reference: ResNet-34 at 224px) over samples generated for the
forgotten class and report:
- average entropy of the softmax outputs,
- average probability assigned to the forgotten class,
- accuracy on the forgotten class (UA — lower is better unlearning).

Also covers SD/eval-scripts/imageclassify.py (top-k classification of
generated images).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from uurg_tpu.eval.features import entropy, softmax


def resize_batch(images_uint8: np.ndarray, size: int = 224) -> jnp.ndarray:
    """uint8 NHWC -> float32 [0,1] bilinear-resized (jitted on device)."""
    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    return jax.image.resize(
        x, (x.shape[0], size, size, x.shape[3]), "bilinear")


def classifier_probe(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    images_uint8: np.ndarray,
    forgotten_label: int,
    batch_size: int = 64,
    resize_to: int | None = 224,
) -> dict:
    """Evaluate generated forget-class samples with any classifier.

    ``logits_fn(images_f32_NHWC) -> logits``; images are samples generated
    while CONDITIONING on the forgotten class.
    """
    probs = []
    for i in range(0, len(images_uint8), batch_size):
        batch = images_uint8[i : i + batch_size]
        x = (resize_batch(batch, resize_to) if resize_to
             else jnp.asarray(batch, jnp.float32) / 255.0)
        probs.append(softmax(np.asarray(logits_fn(x))))
    p = np.concatenate(probs)
    return {
        "avg_entropy": float(entropy(p).mean()),
        "avg_prob_forgotten": float(p[:, forgotten_label].mean()),
        "forget_accuracy": float(
            (p.argmax(axis=1) == forgotten_label).mean()),
        "n": len(p),
    }


def topk_classification(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    images_uint8: np.ndarray,
    k: int = 5,
    batch_size: int = 64,
    resize_to: int | None = 224,
) -> np.ndarray:
    """Per-image top-k class indices (SD/eval-scripts/imageclassify.py)."""
    out = []
    for i in range(0, len(images_uint8), batch_size):
        x = (resize_batch(images_uint8[i : i + batch_size], resize_to)
             if resize_to else
             jnp.asarray(images_uint8[i : i + batch_size], jnp.float32) / 255.0)
        logits = np.asarray(logits_fn(x))
        out.append(np.argsort(-logits, axis=1)[:, :k])
    return np.concatenate(out)

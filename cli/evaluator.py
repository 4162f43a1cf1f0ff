#!/usr/bin/env python
"""Generative-metric evaluator CLI — reference-compatible
(DDPM/evaluator.py): computes Inception Score, FID, sFID, Precision, Recall
between a reference image folder/npz and a sample folder/npz, and appends to
results/<dataset>/forget/result.csv.
"""
import argparse
import csv
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_images(path: str) -> np.ndarray:
    """Folder of PNGs or an .npz with key 'arr_0' -> uint8 NHWC."""
    if path.endswith(".npz"):
        return np.load(path)["arr_0"]
    from PIL import Image

    files = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if not files:
        raise FileNotFoundError(f"no images in {path}")
    return np.stack([np.asarray(Image.open(os.path.join(path, f))
                                .convert("RGB"), np.uint8) for f in files])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ref_batch", type=str,
                   help="reference images (folder or npz)")
    p.add_argument("sample_batch", type=str,
                   help="generated images (folder or npz)")
    p.add_argument("--inception_weights", type=str, default="",
                   help="npz of InceptionV3 weights (flax layout)")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--csv", type=str,
                   default="results/cifar10/forget/result.csv")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    from uurg_tpu.eval.generative import evaluate_all
    from uurg_tpu.eval.inception import (init_inception, load_inception_npz,
                                         make_extractor)

    if args.inception_weights:
        variables = load_inception_npz(args.inception_weights)
    else:
        logging.warning("no inception weights given — metrics use a "
                        "randomly-initialized InceptionV3 (NOT comparable "
                        "to published FID numbers)")
        _, variables = init_inception(jax.random.key(0))
    extractor = make_extractor(variables, materialize=False)

    ref = load_images(args.ref_batch)
    sample = load_images(args.sample_batch)
    metrics = evaluate_all(extractor, ref, sample, args.batch_size)

    print("Inception Score:", metrics["inception_score"])
    print("FID:", metrics["fid"])
    print("sFID:", metrics["sfid"])
    print("Precision:", metrics["precision"])
    print("Recall:", metrics["recall"])

    os.makedirs(os.path.dirname(args.csv), exist_ok=True)
    write_header = not os.path.exists(args.csv)
    with open(args.csv, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["ref", "sample"] + list(metrics))
        if write_header:
            w.writeheader()
        w.writerow({"ref": args.ref_batch, "sample": args.sample_batch,
                    **metrics})


if __name__ == "__main__":
    main()

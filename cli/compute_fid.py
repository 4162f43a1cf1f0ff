#!/usr/bin/env python
"""SD FID eval CLI — reference-flag-compatible
(SD/eval-scripts/compute-fid.py): FID between a real Imagenette-style
folder (remain classes) and a generated-image folder.

The reference uses torchmetrics FID(feature=64) over HF Imagenette; here
both sides come from local folders and go through the shared Inception
extractor (random-init unless --inception_weights — see cli/evaluator.py).
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--folder_path", type=str, required=True,
                   help="generated images folder")
    p.add_argument("--real_path", type=str, required=True,
                   help="real image folder (Imagenette subset layout)")
    p.add_argument("--class_to_forget", type=int, default=6,
                   help="class EXCLUDED from the real set (remain FID)")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--inception_weights", type=str, default="")
    p.add_argument("--batch_size", type=int, default=64)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    from uurg_tpu.data import class_forget_split
    from uurg_tpu.data.lazy import LazyImageFolder
    from uurg_tpu.eval.generative import compute_fid
    from uurg_tpu.eval.inception import (init_inception, load_inception_npz,
                                         make_extractor)

    if args.inception_weights:
        variables = load_inception_npz(args.inception_weights)
    else:
        logging.warning("random-init InceptionV3 — NOT comparable to "
                        "published FID numbers (see PARITY.md)")
        _, variables = init_inception(jax.random.key(0))
    extractor = make_extractor(variables)

    real_ds = LazyImageFolder(args.real_path, args.image_size)
    real_ds, _ = class_forget_split(real_ds, args.class_to_forget)

    def pool_feats(get_batch, n):
        feats = []
        for i in range(0, n, args.batch_size):
            idx = np.arange(i, min(i + args.batch_size, n))
            x, _ = get_batch(idx)
            feats.append(extractor((x * 255).astype(np.uint8))[0])
        return np.concatenate(feats)

    from uurg_tpu.data.lazy import LazyImageFolder as _LIF

    fake_paths = np.asarray(sorted(
        os.path.join(args.folder_path, f)
        for f in os.listdir(args.folder_path)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))))
    fake_ds = _LIF("", args.image_size, paths=fake_paths,
                   labels=np.zeros(len(fake_paths), np.int64))

    real = pool_feats(real_ds.get_batch, len(real_ds))
    fake = pool_feats(fake_ds.get_batch, len(fake_ds))
    fid = compute_fid(real, fake)
    print(f"FID: {fid}")


if __name__ == "__main__":
    main()

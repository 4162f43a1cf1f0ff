#!/usr/bin/env python
"""SD classifier eval CLI — reference-flag-compatible
(SD/eval-scripts/imageclassify.py): top-k classification of generated
images -> CSV. The reference runs torchvision ResNet-50; here any trained
uurg_tpu classifier checkpoint serves (cli/train_classifier.py), defaulting
to ResNet50 at 224px.
"""
import argparse
import csv
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--folder_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True,
                   help="output CSV (image, topk classes)")
    p.add_argument("--classifier_ckpt", type=str, default="",
                   help="orbax classifier checkpoint; random init if empty")
    p.add_argument("--model", type=str, default="ResNet50")
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    from PIL import Image

    from uurg_tpu.eval.classifier_eval import topk_classification
    from uurg_tpu.io.checkpoint import restore_checkpoint
    from uurg_tpu.models import create_model
    from uurg_tpu.models.resnet import init_classifier
    from uurg_tpu.workloads.classification import Classifier

    model = create_model(args.model, args.num_classes)
    cls = Classifier(model)
    params, batch_stats = init_classifier(jax.random.key(0), model)
    if args.classifier_ckpt:
        ck = restore_checkpoint(args.classifier_ckpt,
                                {"params": params,
                                 "batch_stats": batch_stats})
        params, batch_stats = ck["params"], ck["batch_stats"]
    else:
        logging.warning("random-init classifier — class ids are not "
                        "meaningful without a trained checkpoint")

    names = sorted(f for f in os.listdir(args.folder_path)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    imgs = np.stack([
        np.asarray(Image.open(os.path.join(args.folder_path, f))
                   .convert("RGB"), np.uint8) for f in names])
    logits_fn = jax.jit(lambda x: cls.eval_apply(params, batch_stats, x))
    topk = topk_classification(logits_fn, imgs, k=args.topk,
                               batch_size=args.batch_size)

    os.makedirs(os.path.dirname(args.save_path) or ".", exist_ok=True)
    with open(args.save_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image"] + [f"top{i+1}" for i in range(args.topk)])
        for name, row in zip(names, topk):
            w.writerow([name] + [int(c) for c in row])
    print(f"wrote {args.save_path} ({len(names)} images)")


if __name__ == "__main__":
    main()

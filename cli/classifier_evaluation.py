#!/usr/bin/env python
"""UA classifier evaluation CLI — reference parity
(DDPM/classifier_evaluation.py:16-147): run the fine-tuned probe classifier
over generated forget-class samples; report avg entropy, avg prob of the
forgotten class, and forget-class accuracy (UA); append to the result CSV.
"""
import argparse
import csv
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sample_path", type=str,
                   help="folder/npz of generated forget-class samples")
    p.add_argument("--classifier_ckpt", type=str, required=True)
    p.add_argument("--label_of_forgotten_class", type=int, default=0)
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--image_size", type=int, default=224,
                   help="resolution samples are resized to before the probe "
                        "— MUST match the probe's training resolution "
                        "(224 for the reference's fine-tuned ResNet-34, "
                        "train_classifier.py --image_size otherwise)")
    p.add_argument("--csv", type=str,
                   default="results/cifar10/forget/result.csv")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from uurg_tpu.eval.classifier_eval import classifier_probe
    from uurg_tpu.io.checkpoint import restore_checkpoint
    from uurg_tpu.models.resnet import ResNet, BasicBlock, init_classifier
    from uurg_tpu.workloads.classification import Classifier

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from evaluator import load_images  # reuse folder/npz loader

    model = ResNet([3, 4, 6, 3], BasicBlock, args.num_classes,
                   imagenet_stem=True, dtype=jnp.bfloat16)
    cls = Classifier(model)
    params, batch_stats = init_classifier(jax.random.key(0), model,
                                          resolution=args.image_size)
    ck = restore_checkpoint(args.classifier_ckpt,
                            {"params": params, "batch_stats": batch_stats})
    logits_fn = jax.jit(
        lambda x: cls.eval_apply(ck["params"], ck["batch_stats"], x))

    images = load_images(args.sample_path)
    metrics = classifier_probe(logits_fn, images,
                               args.label_of_forgotten_class,
                               args.batch_size, resize_to=args.image_size)
    print("Average entropy:", metrics["avg_entropy"])
    print("Average prob of forgotten class:", metrics["avg_prob_forgotten"])
    print("Forget accuracy (UA):", metrics["forget_accuracy"])

    os.makedirs(os.path.dirname(args.csv), exist_ok=True)
    write_header = not os.path.exists(args.csv)
    with open(args.csv, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["sample"] + list(metrics))
        if write_header:
            w.writeheader()
        w.writerow({"sample": args.sample_path, **metrics})


if __name__ == "__main__":
    main()

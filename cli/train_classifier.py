#!/usr/bin/env python
"""Train/fine-tune the UA probe classifier — reference parity
(DDPM/train_classifier.py): ResNet-34 with ImageNet stem at 224x224 on
CIFAR-10/STL-10, saved for cli/classifier_evaluation.py.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="CIFAR10")
    p.add_argument("--data_path", type=str, default="./data")
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_path", type=str,
                   default="results/ua_classifier")
    p.add_argument("--noise_std", type=float, default=0.0,
                   help="Gaussian pixel-noise augmentation; makes the probe "
                        "robust to generative-sample artifacts (the "
                        "reference probe gets this robustness from "
                        "fine-tuning on real data at 224px)")
    p.add_argument("--torch_init", type=str, default=None,
                   help="locally-supplied torchvision ResNet-34 .pth to "
                        "start fine-tuning from (the reference probe uses "
                        "pretrained=True, DDPM/train_classifier.py)")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uurg_tpu.data import dataset_registry, synthetic_dataset
    from uurg_tpu.data.arrays import infinite_batches, random_flip_batch
    from uurg_tpu.eval.classifier_eval import resize_batch
    from uurg_tpu.io.checkpoint import save_checkpoint
    from uurg_tpu.models.resnet import ResNet, BasicBlock, init_classifier
    from uurg_tpu.train import make_optimizer
    from uurg_tpu.workloads.classification import Classifier

    try:
        train_ds = dataset_registry.get(args.dataset)(args.data_path, True)
    except FileNotFoundError:
        logging.warning("dataset missing — synthetic fallback")
        # base_seed=0 matches the DDPM runner's synthetic fallback so the
        # probe actually recognizes generated classes (ddpm_runner.py:55)
        train_ds = synthetic_dataset(2048, 32, 3, args.num_classes,
                                     base_seed=0)

    model = ResNet([3, 4, 6, 3], BasicBlock, args.num_classes,
                   imagenet_stem=True, dtype=jnp.bfloat16)
    cls = Classifier(model)
    params, batch_stats = init_classifier(
        jax.random.key(args.seed), model, resolution=args.image_size)
    if args.torch_init:
        from uurg_tpu.io.torch_classifier import (load_torch_classifier,
                                                  overlay_pretrained)
        t_params, t_stats = load_torch_classifier(args.torch_init, "ResNet34")
        params = overlay_pretrained(params, t_params, "params")
        batch_stats = overlay_pretrained(batch_stats, t_stats, "batch_stats")
    opt = make_optimizer("adamw", args.lr, weight_decay=1e-4)
    train_step = cls.make_train_step(opt)
    opt_state = jax.jit(opt.init)(params)

    steps_per_epoch = max(1, len(train_ds) // args.batch_size)
    carry = (params, batch_stats, opt_state, jnp.zeros((), jnp.int32))
    key = jax.random.key(args.seed)
    for epoch in range(args.epochs):
        def aug(x, rng):
            x = random_flip_batch(x, rng)
            if args.noise_std > 0:
                x = np.clip(
                    x + rng.normal(0, args.noise_std, x.shape)
                    .astype(np.float32), 0.0, 1.0)
            return x

        it = infinite_batches(train_ds, args.batch_size,
                              seed=args.seed + epoch, transform=aug)
        for _ in range(steps_per_epoch):
            x, y = next(it)
            x224 = resize_batch((x * 255).astype(np.uint8), args.image_size)
            key, sub = jax.random.split(key)
            carry, m = train_step(carry, (x224, jnp.asarray(y)), sub)
        logging.info("epoch %d loss %.4f acc %.2f", epoch,
                     float(m["loss"]), float(m["acc"]))
    os.makedirs(args.save_path, exist_ok=True)
    save_checkpoint(
        os.path.join(args.save_path, f"{args.dataset.lower()}_resnet34"),
        {"params": carry[0], "batch_stats": carry[1]})
    print(f"saved {args.save_path}")


if __name__ == "__main__":
    main()

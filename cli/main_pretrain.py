#!/usr/bin/env python
"""Classifier pretraining CLI — reference-flag-compatible
(Classification/main_pretrain.py:16-97): SGD/AdamW + cosine schedule,
saves the best-accuracy checkpoint.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    # reference flag names (Classification/main_pretrain.py) kept as aliases
    p.add_argument("--dataset", "-d", type=str, default="CIFAR10")
    p.add_argument("--data_path", "--data_dir", type=str, default="./data")
    p.add_argument("--model", type=str, default="ResNet18")
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--input_size", nargs=3, type=int, default=None,
                   help="accepted for reference parity")
    p.add_argument("--sched", type=str, default="cosine",
                   help="lr schedule (cosine, the reference default)")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch_size", "-b", type=int, default=256)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--opt", type=str, default="sgd", choices=["sgd", "adamw"])
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_path", type=str, default="results/pretrain")
    p.add_argument("--torch_init", type=str, default=None,
                   help="locally-supplied torchvision/reference .pth to "
                        "initialize the backbone from (the reference's "
                        "weights='DEFAULT' equivalent; head re-initialized "
                        "on shape mismatch)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "f32", "bfloat16", "bf16"],
                   help="model compute dtype; bf16 is the TPU-native "
                        "choice (params/BN stats stay f32)")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uurg_tpu.data import dataset_registry, synthetic_dataset
    from uurg_tpu.data.arrays import (epoch_batches, infinite_batches,
                                      pad_crop_batch, random_flip_batch)
    from uurg_tpu.io.checkpoint import save_checkpoint
    from uurg_tpu.models import create_model
    from uurg_tpu.models.resnet import init_classifier
    from uurg_tpu.train import make_optimizer
    from uurg_tpu.workloads.classification import Classifier

    try:
        train_ds = dataset_registry.get(args.dataset)(args.data_path, True)
        test_ds = dataset_registry.get(args.dataset)(args.data_path, False)
    except FileNotFoundError:
        logging.warning("dataset not found; synthetic fallback")
        train_ds = synthetic_dataset(2048, 32, 3, args.num_classes, args.seed,
                                     base_seed=args.seed)
        test_ds = synthetic_dataset(512, 32, 3, args.num_classes,
                                    args.seed + 1, base_seed=args.seed)

    dtype = (jnp.bfloat16 if args.dtype in ("bfloat16", "bf16")
             else jnp.float32)
    model = create_model(args.model, args.num_classes, dtype=dtype)
    cls = Classifier(model)
    params, batch_stats = init_classifier(jax.random.key(args.seed), model)
    if args.torch_init:
        from uurg_tpu.io.torch_classifier import (load_torch_classifier,
                                                  overlay_pretrained)
        t_params, t_stats = load_torch_classifier(args.torch_init, args.model)
        params = overlay_pretrained(params, t_params, "params")
        if t_stats:
            batch_stats = overlay_pretrained(batch_stats, t_stats,
                                             "batch_stats")
    opt = make_optimizer(args.opt, args.lr, momentum=args.momentum,
                         weight_decay=args.weight_decay)
    train_step = cls.make_train_step(opt)
    opt_state = jax.jit(opt.init)(params)

    def aug(x, rng):
        return random_flip_batch(pad_crop_batch(x, 4, rng), rng)

    steps_per_epoch = max(1, len(train_ds) // args.batch_size)
    carry = (params, batch_stats, opt_state, jnp.zeros((), jnp.int32))
    best_acc = -1.0
    os.makedirs(args.save_path, exist_ok=True)
    key = jax.random.key(args.seed)
    for epoch in range(args.epochs):
        lr_now = args.lr * (1 + np.cos(np.pi * epoch / args.epochs)) / 2
        it = infinite_batches(train_ds, args.batch_size,
                              seed=args.seed + epoch, transform=aug)
        for _ in range(steps_per_epoch):
            x, y = next(it)
            carry[2].hyperparams["learning_rate"] = lr_now
            key, sub = jax.random.split(key)
            carry, m = train_step(carry, (jnp.asarray(x), jnp.asarray(y)), sub)
        val = cls.validate(carry[0], carry[1],
                           epoch_batches(test_ds, args.batch_size))
        logging.info("epoch %d val acc %.2f", epoch, val["acc"])
        if val["acc"] > best_acc:
            best_acc = val["acc"]
            save_checkpoint(os.path.join(args.save_path,
                                         f"{args.model}_best"),
                            {"params": carry[0], "batch_stats": carry[1]},
                            metadata={"acc": best_acc, "epoch": epoch})
    print(f"best acc {best_acc:.2f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Classification random-subset unlearning CLI — reference-flag-compatible
(Classification/main_random.py:23-157): split -> unlearn -> evaluate -> CSV.
"""
import argparse
import csv
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    # reference aliases (Classification/main_random.py flag names) are kept
    # so the published command lines run verbatim
    p.add_argument("--dataset", "-d", type=str, default="CIFAR10")
    p.add_argument("--data_path", "--data_dir", type=str, default="./data")
    p.add_argument("--model", type=str, default="ResNet18")
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--input_size", nargs=3, type=int, default=None,
                   help="accepted for reference parity; shapes derive from "
                        "the dataset here")
    p.add_argument("--record_result", action="store_true", default=True,
                   help="append the summary CSV (reference flag; default on)")
    p.add_argument("--unlearn_method", "--unlearn", type=str,
                   default="SFRon")
    p.add_argument("--forget_mode", type=str, default="random",
                   choices=["random", "class"],
                   help="random subset (RandomUnlearn) or full class "
                        "(FullClassUnlearn) split")
    p.add_argument("--label_to_forget", type=int, default=0)
    p.add_argument("--forget_ratio", "--forget_perc", type=float,
                   default=0.1)
    p.add_argument("--incremental", type=int, default=0,
                   help="N>0: incremental unlearning over N cumulative "
                        "stages (IncrementalRandomUnlearn parity)")
    p.add_argument("--svc_mia", action="store_true",
                   help="also run the SVC shadow-model MIA")
    p.add_argument("--compare", type=str, default="",
                   help="comma list of methods (e.g. Baseline,Retrain,SFRon)"
                        ": run the comparative protocol from ONE pretrained "
                        "model and append one CSV row per method — the "
                        "reference's comparison-table workflow")
    p.add_argument("--pretrain_epochs", type=int, default=30,
                   help="compare mode: pretrain budget when no --checkpoint "
                        "is given")
    p.add_argument("--checkpoint", type=str, default="",
                   help="pretrained model checkpoint (orbax dir)")
    p.add_argument("--retrain_checkpoint", type=str, default="",
                   help="retrained reference for JS/KL divergence")
    p.add_argument("--synthetic_affinity", type=float, default=0.0,
                   help="stand-in data only: blend each synthetic class "
                        "mean toward its ring-successor so a forgotten "
                        "class has a well-defined nearest retained class "
                        "(CIFAR-like confusability; makes JS-vs-Retrain "
                        "attainable — see data.synthetic_dataset)")
    p.add_argument("--pretrain_lr", type=float, default=0.1,
                   help="compare mode: pretrain/Retrain peak lr "
                        "(main_pretrain.py recipe default). Lower it (~0.05)"
                        " on noisy stand-in data — the 0.1 default "
                        "diverges at --synthetic_noise >= 0.3")
    p.add_argument("--synthetic_noise", type=float, default=0.1,
                   help="stand-in data only: per-sample noise sigma. "
                        "Raising it (~0.5) opens a real train/test "
                        "confidence gap so the SVC-MIA columns land "
                        "strictly inside (0,1) instead of saturating "
                        "(see data.synthetic_dataset)")
    p.add_argument("--batch_size", "-b", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_path", type=str, default="results/classification")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "f32", "bfloat16", "bf16"],
                   help="model compute dtype; bf16 is the TPU-native "
                        "choice (~4x MXU rate vs f32; params/BN stats stay "
                        "f32). Default f32 matches the reference exactly.")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    import jax

    from uurg_tpu.data import (dataset_registry, random_forget_split,
                               synthetic_dataset, epoch_batches)
    from uurg_tpu.data.arrays import pad_crop_batch, random_flip_batch
    from uurg_tpu.eval.features import softmax
    from uurg_tpu.eval.js_div import get_js_divergence
    from uurg_tpu.eval.mia import membership_attack_prob
    from uurg_tpu.io.checkpoint import restore_checkpoint, save_checkpoint
    from uurg_tpu.models import create_model
    from uurg_tpu.models.resnet import init_classifier
    from uurg_tpu.unlearn.methods.classification import (
        UnlearnContext, unlearn_method_registry)
    from uurg_tpu.workloads.classification import Classifier

    os.makedirs(args.save_path, exist_ok=True)
    try:
        train_ds = dataset_registry.get(args.dataset)(args.data_path, True)
        test_ds = dataset_registry.get(args.dataset)(args.data_path, False)
    except FileNotFoundError:
        logging.warning("dataset %s not found; synthetic fallback",
                        args.dataset)
        # explicit base_seed on BOTH splits shares the class patterns so the
        # held-out split measures generalization (different seed alone would
        # generate a disjoint class distribution: test accuracy at chance)
        train_ds = synthetic_dataset(2048, 32, 3, args.num_classes, args.seed,
                                     base_seed=args.seed,
                                     class_affinity=args.synthetic_affinity,
                                     noise_sigma=args.synthetic_noise)
        test_ds = synthetic_dataset(512, 32, 3, args.num_classes,
                                    args.seed + 1, base_seed=args.seed,
                                    class_affinity=args.synthetic_affinity,
                                    noise_sigma=args.synthetic_noise)

    if args.forget_mode == "class":
        from uurg_tpu.data import class_forget_split

        retain, forget = class_forget_split(train_ds, args.label_to_forget)
    else:
        retain, forget = random_forget_split(train_ds, args.forget_ratio,
                                             args.seed, args.save_path)

    import jax.numpy as jnp

    dtype = (jnp.bfloat16 if args.dtype in ("bfloat16", "bf16")
             else jnp.float32)
    model = create_model(args.model, args.num_classes, dtype=dtype)
    cls = Classifier(model)
    params, batch_stats = init_classifier(jax.random.key(args.seed), model)
    if args.checkpoint:
        ck = restore_checkpoint(args.checkpoint,
                                {"params": params, "batch_stats": batch_stats})
        params, batch_stats = ck["params"], ck["batch_stats"]

    def aug(x, rng):
        return random_flip_batch(pad_crop_batch(x, 4, rng), rng)

    if args.compare:
        from uurg_tpu.unlearn.protocol import run_comparison

        rows = run_comparison(
            model, train_ds, test_ds,
            methods=[m for m in args.compare.split(",") if m],
            forget_mode=args.forget_mode,
            label_to_forget=args.label_to_forget,
            forget_ratio=args.forget_ratio,
            batch_size=args.batch_size, seed=args.seed,
            num_classes=args.num_classes,
            pretrain_epochs=args.pretrain_epochs,
            pretrain_lr=args.pretrain_lr,
            # Retrain trains from scratch with the same recipe the
            # pretrain stage used — at the default 0.1 this is exactly the
            # reference's retrain.py lr, so nothing changes unless the
            # user lowered the lr for noisy stand-in data
            overrides={"Retrain": {"lr": args.pretrain_lr}},
            pretrained=((params, batch_stats) if args.checkpoint else None),
            transform=aug,
            csv_path=os.path.join(args.save_path, "results.csv"),
            save_path=args.save_path)
        for row in rows:
            print(row)
        return

    method = unlearn_method_registry.get(args.unlearn_method)
    t0 = time.time()
    if args.incremental > 0:
        # IncrementalRandomUnlearn parity: cumulative forget stages, each
        # stage unlearning starting from the previous stage's model
        from uurg_tpu.data import incremental_random_split

        stages = incremental_random_split(
            train_ds, args.forget_ratio, args.incremental, args.seed,
            args.save_path)
        u_params, u_bs = params, batch_stats
        for si, (retain, forget) in enumerate(stages):
            ctx = UnlearnContext(
                classifier=cls, params=u_params, batch_stats=u_bs,
                retain_train=retain, forget_train=forget,
                num_classes=args.num_classes, batch_size=args.batch_size,
                seed=args.seed + si, save_path=args.save_path,
                transform=aug, init_fn=lambda k: init_classifier(k, model),
            )
            u_params, u_bs = method(ctx)
            logging.info("incremental stage %d/%d done", si + 1,
                         args.incremental)
    else:
        ctx = UnlearnContext(
            classifier=cls, params=params, batch_stats=batch_stats,
            retain_train=retain, forget_train=forget,
            num_classes=args.num_classes, batch_size=args.batch_size,
            seed=args.seed, save_path=args.save_path, transform=aug,
            init_fn=lambda k: init_classifier(k, model),
        )
        u_params, u_bs = method(ctx)
    unlearn_time = time.time() - t0

    # evaluation: accuracies + MIA + JS vs retrained
    def batches(ds):
        return epoch_batches(ds, args.batch_size)

    res = {
        "method": args.unlearn_method,
        "unlearn_time": round(unlearn_time, 2),
        "retain_acc": cls.validate(u_params, u_bs, batches(retain))["acc"],
        "forget_acc": cls.validate(u_params, u_bs, batches(forget))["acc"],
        "test_acc": cls.validate(u_params, u_bs, batches(test_ds))["acc"],
    }
    rp, rl = cls.collect_logits(u_params, u_bs, batches(retain))
    fp, fl = cls.collect_logits(u_params, u_bs, batches(forget))
    tp, tl = cls.collect_logits(u_params, u_bs, batches(test_ds))
    res["mia"] = membership_attack_prob(
        softmax(rp), rl, softmax(fp), fl, softmax(tp), tl)

    if args.svc_mia:
        from uurg_tpu.eval.mia import svc_mia

        n = min(len(rl), len(tl))
        svc = svc_mia((softmax(rp[:n]), rl[:n]), (softmax(tp[:n]), tl[:n]),
                      (softmax(fp), fl), (np.zeros((0, rp.shape[1])),
                                          np.zeros((0,), np.int64)))
        for k, v in svc.items():
            res[f"svc_{k}"] = v

    if args.retrain_checkpoint:
        ck = restore_checkpoint(args.retrain_checkpoint,
                                {"params": params, "batch_stats": batch_stats})
        rpp, _ = cls.collect_logits(ck["params"], ck["batch_stats"],
                                    batches(forget))
        res["js_div"] = get_js_divergence(softmax(fp), softmax(rpp))

    save_checkpoint(os.path.join(args.save_path,
                                 f"{args.unlearn_method}_unlearned"),
                    {"params": u_params, "batch_stats": u_bs})

    csv_path = os.path.join(args.save_path, "results.csv")
    write_header = not os.path.exists(csv_path)
    with open(csv_path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(res))
        if write_header:
            w.writeheader()
        w.writerow(res)
    print(res)


if __name__ == "__main__":
    main()

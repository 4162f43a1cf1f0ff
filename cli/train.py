#!/usr/bin/env python
"""DDPM train/unlearn CLI — reference-flag-compatible (DDPM/train.py:15-172).

Modes: pretrain | retrain | sfron | salun | generate_mask | generate_fisher

Examples (matching DDPM/README.md):
  python cli/train.py --config configs/cifar10_pretrain.yml --mode pretrain
  python cli/train.py --config configs/cifar10_fisher.yml --mode generate_fisher \
      --ckpt_folder results/cifar10/pretrain/<ts> --label_to_forget 0
  python cli/train.py --config configs/cifar10_sfron.yml --mode sfron \
      --ckpt_folder results/cifar10/pretrain/<ts> --label_to_forget 0 \
      --forget_alpha 10.0 --decay_forget_alpha --remain_alpha 1.0 \
      --method ron --unlearn_loss adaga --mask_path <mask dir>
"""
import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--mode", type=str, default="pretrain",
                   choices=["pretrain", "retrain", "sfron", "sa", "salun",
                            "generate_mask", "generate_fisher"])
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--exp", type=str, default="results")
    p.add_argument("--ckpt_folder", type=str, default="")
    p.add_argument("--label_to_forget", type=int, default=0)
    p.add_argument("--cond_scale", type=float, default=2.0)
    # sfron flags (DDPM/train.py)
    p.add_argument("--forget_alpha", type=float, default=10.0)
    p.add_argument("--remain_alpha", type=float, default=1.0)
    p.add_argument("--decay_forget_alpha", action="store_true")
    p.add_argument("--method", type=str, default="ron",
                   choices=["ron", "joint"])
    p.add_argument("--unlearn_loss", type=str, default="adaga",
                   choices=["adaga", "ga", "rl"])
    p.add_argument("--mask_path", type=str, default="")
    # mask generation
    p.add_argument("--threshold", type=float, nargs="+", default=[1.0])
    p.add_argument("--mask_ratio", type=float, nargs="+", default=[0.5])
    p.add_argument("--n_iters", type=int, default=0,
                   help="override config training.n_iters (smoke runs)")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    from uurg_tpu.core.config import load_config
    from uurg_tpu.workloads import ddpm_runner as R

    config = load_config(args.config)
    if args.n_iters > 0:
        config.training.n_iters = args.n_iters
    ds_name = config.data.dataset.lower()
    run_dir = os.path.join(args.exp, ds_name, args.mode,
                           time.strftime("%Y%m%d-%H%M%S"))
    ckpt_dir = os.path.join(run_dir, "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    config.ckpt_dir = ckpt_dir

    if args.mode == "pretrain":
        R.pretrain(args, config, ckpt_dir)
    elif args.mode == "retrain":
        # exact unlearning: pretraining on the remain split only
        from uurg_tpu.data import class_forget_split

        remain, _ = class_forget_split(
            R._load_train_dataset(args, config), args.label_to_forget)
        R.pretrain(args, config, ckpt_dir, dataset=remain)
    elif args.mode == "generate_fisher":
        out = os.path.join(args.ckpt_folder or run_dir,
                           f"mask_{args.label_to_forget}")
        R.generate_fisher(args, config, out)
        R.generate_fisher_mask(out, args.threshold)
    elif args.mode == "generate_mask":
        out = os.path.join(args.ckpt_folder or run_dir,
                           f"salun_mask_{args.label_to_forget}")
        R.generate_salun_mask(args, config, out, args.mask_ratio)
    elif args.mode == "sfron":
        R.sfron_forget(args, config, ckpt_dir)
    elif args.mode == "sa":
        R.sa_forget(args, config, ckpt_dir)
    elif args.mode == "salun":
        # SalUn = RandomLabel loss + top-k mask, via the same engine
        args.unlearn_loss = "rl"
        R.sfron_forget(args, config, ckpt_dir)
    print(f"done: {run_dir}")


if __name__ == "__main__":
    main()

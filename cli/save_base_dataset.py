#!/usr/bin/env python
"""Export CIFAR-10 train images minus one class as a PNG reference folder —
reference parity (DDPM/save_base_dataset.py): builds the FID reference batch
``cifar10_without_label_{k}``.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_path", type=str, default="./data")
    p.add_argument("--label_to_forget", type=int, default=0)
    p.add_argument("--out", type=str, default="")
    p.add_argument("--as_npz", action="store_true",
                   help="write one npz instead of PNG files (faster IO)")
    args = p.parse_args()

    import logging

    import numpy as np
    from PIL import Image

    from uurg_tpu.data import class_forget_split, load_cifar10, synthetic_dataset

    try:
        ds = load_cifar10(args.data_path, train=True)
    except FileNotFoundError:
        logging.warning("CIFAR-10 not found under %s — synthetic fallback "
                        "(same distribution the smoke-train runners use)",
                        args.data_path)
        ds = synthetic_dataset(2048, 32, 3, 10, base_seed=0)
        ds.images = (ds.images * 255).round().astype(np.uint8)
    remain, _ = class_forget_split(ds, args.label_to_forget)
    out = args.out or f"cifar10_without_label_{args.label_to_forget}"
    if args.as_npz:
        np.savez_compressed(out if out.endswith(".npz") else out + ".npz",
                            arr_0=remain.images)
        print(f"wrote {len(remain)} images -> {out}.npz")
        return
    os.makedirs(out, exist_ok=True)
    for i, (img, lab) in enumerate(zip(remain.images, remain.labels)):
        Image.fromarray(img).save(
            os.path.join(out, f"{int(lab)}_{i:06d}.png"))
    print(f"wrote {len(remain)} images -> {out}/")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Standalone Fisher-ratio mask CLI — reference-flag-compatible with BOTH
DDPM/generate_fisher_mask.py:17-48 and
SD/train-scripts/generate_fisher_mask.py:17-48 (identical flags, different
artifact names): threshold (F_forget + eps)/(F_remain + eps) >= th over an
existing Fisher folder without recomputing the Fishers.

Layout is auto-detected from the folder contents:
  {forget,remain}_fisher  (DDPM)  -> fisher_<th>
  nude_{forget,remain}    (SD)    -> nude_mask_<th>
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt_folder", type=str, required=True,
                   help="Path to fisher ckpt path")
    p.add_argument("--threshold", type=float, nargs="+", default=[1.0],
                   help="Saliency map threshold, lambda in paper")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    from uurg_tpu.io.checkpoint import restore_checkpoint, save_checkpoint
    from uurg_tpu.unlearn.saliency import fisher_ratio_mask, mask_sparsity

    folder = args.ckpt_folder
    if os.path.isdir(os.path.join(folder, "forget_fisher")):
        names, out_fmt = ("forget_fisher", "remain_fisher"), "fisher_{th}"
    elif os.path.isdir(os.path.join(folder, "nude_forget")):
        names, out_fmt = ("nude_forget", "nude_remain"), "nude_mask_{th}"
    else:
        raise SystemExit(
            f"no Fisher artifacts in {folder}: expected "
            "{forget,remain}_fisher (DDPM) or nude_{forget,remain} (SD)")
    ff = restore_checkpoint(os.path.join(folder, names[0]))
    rf = restore_checkpoint(os.path.join(folder, names[1]))
    for th in args.threshold:
        mask = fisher_ratio_mask(ff, rf, float(th))
        logging.info("threshold %.3g -> sparsity %.2f%%", th,
                     mask_sparsity(mask) * 100)
        save_checkpoint(os.path.join(folder, out_fmt.format(th=th)), mask)
    print(f"done: {folder}")


if __name__ == "__main__":
    main()

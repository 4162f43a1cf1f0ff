#!/usr/bin/env python
"""DiT saliency-mask CLI — reference-flag-compatible
(DiT/generate_mask.py:48-56): threshold the Fisher ratio
(F_forget + eps)/(F_remain + eps) >= th per class and save
<mask-path>/<class>/fisher_<th> next to the Fisher artifacts
(DiT/generate_mask.py:17-46).
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mask-path", type=str, required=True,
                   help="dir holding <class>/{forget,remain}_fisher")
    p.add_argument("--forget-class", nargs="+", type=int, required=True)
    p.add_argument("--thresholds", nargs="+", type=float,
                   default=[0.5, 1, 3, 5, 10])
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    from uurg_tpu.workloads.dit_runner import dit_generate_mask

    for cls in args.forget_class:
        fisher_dir = os.path.join(args.mask_path, str(cls))
        dit_generate_mask(fisher_dir, args.thresholds)
        logging.info("masks for class %d: %s", cls, fisher_dir)


if __name__ == "__main__":
    main()

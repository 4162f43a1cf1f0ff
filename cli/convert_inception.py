#!/usr/bin/env python
"""Convert torchvision/pytorch-fid InceptionV3 weights to the Flax npz used
by uurg_tpu.eval.inception (FID parity with the reference TF1 evaluator,
DDPM/evaluator.py:32-36, requires the standard Inception weights; this
environment has no network egress, so conversion runs on a locally provided
.pth file such as pt_inception-2015-12-05 from pytorch-fid).

Usage: python cli/convert_inception.py weights.pth out.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from uurg_tpu.io.inception_interop import convert_inception_state_dict as convert  # noqa: E501


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("torch_weights", type=str)
    p.add_argument("out_npz", type=str)
    args = p.parse_args()
    import torch

    sd = torch.load(args.torch_weights, map_location="cpu",
                    weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    flat = convert(sd)
    np.savez(args.out_npz, **flat)
    print(f"wrote {len(flat)} arrays -> {args.out_npz}")


if __name__ == "__main__":
    main()

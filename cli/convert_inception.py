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

# torchvision block name -> our module name
_BLOCK = {
    "Conv2d_1a_3x3": "Conv2d_1a", "Conv2d_2a_3x3": "Conv2d_2a",
    "Conv2d_2b_3x3": "Conv2d_2b", "Conv2d_3b_1x1": "Conv2d_3b",
    "Conv2d_4a_3x3": "Conv2d_4a",
}
# torchvision branch name -> our submodule name (per inception block type)
_BRANCH = {
    "branch1x1": "b1x1",
    "branch5x5_1": "b5x5_1", "branch5x5_2": "b5x5_2",
    "branch3x3dbl_1": "b3x3dbl_1", "branch3x3dbl_2": "b3x3dbl_2",
    "branch3x3dbl_3": "b3x3dbl_3",
    "branch3x3dbl_3a": "b3x3dbl_3a", "branch3x3dbl_3b": "b3x3dbl_3b",
    "branch_pool": "bpool",
    "branch3x3": "b3x3", "branch3x3_1": "b3x3_1", "branch3x3_2": "b3x3_2",
    "branch3x3_2a": "b3x3_2a", "branch3x3_2b": "b3x3_2b",
    "branch7x7_1": "b7x7_1", "branch7x7_2": "b7x7_2", "branch7x7_3": "b7x7_3",
    "branch7x7dbl_1": "b7x7dbl_1", "branch7x7dbl_2": "b7x7dbl_2",
    "branch7x7dbl_3": "b7x7dbl_3", "branch7x7dbl_4": "b7x7dbl_4",
    "branch7x7dbl_5": "b7x7dbl_5",
    "branch7x7x3_1": "b7x7x3_1", "branch7x7x3_2": "b7x7x3_2",
    "branch7x7x3_3": "b7x7x3_3", "branch7x7x3_4": "b7x7x3_4",
}


def convert(state_dict) -> dict:
    out = {}
    for key, val in state_dict.items():
        v = np.asarray(val.detach().cpu().numpy()
                       if hasattr(val, "detach") else val)
        parts = key.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                out["params/fc/kernel"] = v.T
            else:
                out["params/fc/bias"] = v
            continue
        if parts[0] in _BLOCK:
            mod = [_BLOCK[parts[0]]]
            rest = parts[1:]
        elif parts[0].startswith("Mixed_"):
            mod = [parts[0], _BRANCH[parts[1]]]
            rest = parts[2:]
        elif parts[0] == "AuxLogits":
            continue  # not used by the evaluator
        else:
            raise KeyError(f"unmapped key {key}")
        layer, pname = rest[0], rest[1]
        if layer == "conv":
            assert pname == "weight"
            out["/".join(["params", *mod, "conv", "kernel"])] = (
                v.transpose(2, 3, 1, 0))
        elif layer == "bn":
            coll = {"weight": ("params", "scale"), "bias": ("params", "bias"),
                    "running_mean": ("batch_stats", "mean"),
                    "running_var": ("batch_stats", "var")}
            if pname == "num_batches_tracked":
                continue
            root, leaf = coll[pname]
            out["/".join([root, *mod, "bn", leaf])] = v
        else:
            raise KeyError(f"unmapped layer in {key}")
    return out


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

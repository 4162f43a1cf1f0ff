"""Torch InceptionV3 (pt_inception / torchvision key layout) -> Flax
variables for uurg_tpu.eval.inception.

Parity chain: the reference evaluates FID/IS with the TF1 frozen graph
(DDPM/evaluator.py:32-36); pytorch-fid's ``pt_inception-2015-12-05`` is the
standard torch port of those weights using torchvision module names, and
this converter maps that layout onto our Flax FID-variant model.
Validated numerically on random weights by tests/test_inception_parity.py.
"""
from __future__ import annotations

import numpy as np

# torch stem block name -> flax module name
_BLOCK = {
    "Conv2d_1a_3x3": "Conv2d_1a", "Conv2d_2a_3x3": "Conv2d_2a",
    "Conv2d_2b_3x3": "Conv2d_2b", "Conv2d_3b_1x1": "Conv2d_3b",
    "Conv2d_4a_3x3": "Conv2d_4a",
}
# torch branch name -> flax submodule name (per inception block type)
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


def convert_inception_state_dict(state_dict) -> dict[str, np.ndarray]:
    """Flat ``'root/mod/.../leaf' -> array`` mapping (the npz layout read by
    uurg_tpu.eval.inception.load_inception_npz)."""
    out: dict[str, np.ndarray] = {}
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


def unflatten_variables(flat: dict[str, np.ndarray]) -> dict:
    """'a/b/c' -> nested {'a': {'b': {'c': array}}} (jnp-converted)."""
    import jax.numpy as jnp

    variables: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = variables
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return variables

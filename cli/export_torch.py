#!/usr/bin/env python
"""Export an Orbax DDPM checkpoint to the reference torch list format
(BASELINE 'interchangeable checkpoints'): [model_sd, {}, step, ema_sd] with
``module.``-prefixed keys, loadable by the reference's
runners/diffusion.py:618-637.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--ckpt", type=str, required=True, help="orbax dir")
    p.add_argument("--out", type=str, required=True, help="output .pth")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from uurg_tpu.core.config import load_config
    from uurg_tpu.io.checkpoint import restore_checkpoint
    from uurg_tpu.io.torch_interop import flax_unet_params_to_torch
    from uurg_tpu.workloads.ddpm import DDPMWorkload

    config = load_config(args.config)
    wl = DDPMWorkload.from_config(config)
    like = wl.init_params(jax.random.key(0))
    ck = restore_checkpoint(args.ckpt, {"params": like, "ema_params": like,
                                        "step": jnp.zeros((), jnp.int32)})

    def to_torch_sd(params):
        sd = flax_unet_params_to_torch(params)
        return {f"module.{k}": torch.from_numpy(v.copy())
                for k, v in sd.items()}

    states = [to_torch_sd(ck["params"]), {}, int(ck["step"])]
    if ck.get("ema_params") is not None:
        states.append(to_torch_sd(ck["ema_params"]))
    torch.save(states, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
